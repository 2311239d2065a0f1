"""Version-stamped pin of the cosmjs ``defaultRegistryTypes`` closure
(VERDICT r11 next #1).

The reference registers ALL defaultRegistryTypes and dispatches decode
through the registry (src/utils/decoder.js:9-29).  This test enumerates
the membership of that closure as published by **@cosmjs/stargate
v0.32.x** (packages/stargate/src/signingstargateclient.ts:
``defaultRegistryTypes = [Coin, ...authzTypes, ...bankTypes,
...distributionTypes, ...feegrantTypes, ...govTypes, ...groupTypes,
...stakingTypes, ...ibcTypes, ...vestingTypes]``) and asserts the
engine's registered top-level URL set covers every Msg member, so a
future cosmjs widening shows up as a named red assertion instead of a
silent coverage gap.

Documented deltas vs the pin:

* **Intentional non-member**: ``/cosmos.base.v1beta1.Coin`` — the one
  non-Msg entry in defaultRegistryTypes.  It is a nested payload type,
  never a top-level Any; the engine decodes Coin inside every
  amount-bearing arm (``_coin_amt`` on all five surfaces) rather than
  as a dispatch row.
* **Intentional extensions** (registered beyond the cosmjs closure,
  matching what the indexed chain actually carries): the two cosmwasm
  messages (@cosmjs/cosmwasm-stargate ``wasmTypes``), slashing
  MsgUnjail, crisis MsgVerifyInvariant, evidence MsgSubmitEvidence,
  and the two non-cosmjs vesting accounts (permanent-locked,
  periodic).
"""

from __future__ import annotations

COSMJS_VERSION_PIN = "@cosmjs/stargate 0.32.x"

# the Msg members of defaultRegistryTypes at the pinned version,
# grouped exactly like the cosmjs module arrays they come from
COSMJS_DEFAULT_REGISTRY_MSGS = {
    # authzTypes
    "/cosmos.authz.v1beta1.MsgGrant",
    "/cosmos.authz.v1beta1.MsgExec",
    "/cosmos.authz.v1beta1.MsgRevoke",
    # bankTypes
    "/cosmos.bank.v1beta1.MsgMultiSend",
    "/cosmos.bank.v1beta1.MsgSend",
    # distributionTypes
    "/cosmos.distribution.v1beta1.MsgFundCommunityPool",
    "/cosmos.distribution.v1beta1.MsgSetWithdrawAddress",
    "/cosmos.distribution.v1beta1.MsgWithdrawDelegatorReward",
    "/cosmos.distribution.v1beta1.MsgWithdrawValidatorCommission",
    # feegrantTypes
    "/cosmos.feegrant.v1beta1.MsgGrantAllowance",
    "/cosmos.feegrant.v1beta1.MsgRevokeAllowance",
    # govTypes (v1beta1 + v1)
    "/cosmos.gov.v1beta1.MsgDeposit",
    "/cosmos.gov.v1beta1.MsgSubmitProposal",
    "/cosmos.gov.v1beta1.MsgVote",
    "/cosmos.gov.v1beta1.MsgVoteWeighted",
    "/cosmos.gov.v1.MsgDeposit",
    "/cosmos.gov.v1.MsgExecLegacyContent",
    "/cosmos.gov.v1.MsgSubmitProposal",
    "/cosmos.gov.v1.MsgVote",
    "/cosmos.gov.v1.MsgVoteWeighted",
    # groupTypes (fourteen messages)
    "/cosmos.group.v1.MsgCreateGroup",
    "/cosmos.group.v1.MsgUpdateGroupMembers",
    "/cosmos.group.v1.MsgUpdateGroupAdmin",
    "/cosmos.group.v1.MsgUpdateGroupMetadata",
    "/cosmos.group.v1.MsgCreateGroupPolicy",
    "/cosmos.group.v1.MsgCreateGroupWithPolicy",
    "/cosmos.group.v1.MsgUpdateGroupPolicyAdmin",
    "/cosmos.group.v1.MsgUpdateGroupPolicyDecisionPolicy",
    "/cosmos.group.v1.MsgUpdateGroupPolicyMetadata",
    "/cosmos.group.v1.MsgSubmitProposal",
    "/cosmos.group.v1.MsgWithdrawProposal",
    "/cosmos.group.v1.MsgVote",
    "/cosmos.group.v1.MsgExec",
    "/cosmos.group.v1.MsgLeaveGroup",
    # stakingTypes
    "/cosmos.staking.v1beta1.MsgBeginRedelegate",
    "/cosmos.staking.v1beta1.MsgCancelUnbondingDelegation",
    "/cosmos.staking.v1beta1.MsgCreateValidator",
    "/cosmos.staking.v1beta1.MsgDelegate",
    "/cosmos.staking.v1beta1.MsgEditValidator",
    "/cosmos.staking.v1beta1.MsgUndelegate",
    # ibcTypes: transfer + channel (10) + client (4) + connection (4)
    "/ibc.applications.transfer.v1.MsgTransfer",
    "/ibc.core.channel.v1.MsgAcknowledgement",
    "/ibc.core.channel.v1.MsgChannelCloseConfirm",
    "/ibc.core.channel.v1.MsgChannelCloseInit",
    "/ibc.core.channel.v1.MsgChannelOpenAck",
    "/ibc.core.channel.v1.MsgChannelOpenConfirm",
    "/ibc.core.channel.v1.MsgChannelOpenInit",
    "/ibc.core.channel.v1.MsgChannelOpenTry",
    "/ibc.core.channel.v1.MsgRecvPacket",
    "/ibc.core.channel.v1.MsgTimeout",
    "/ibc.core.channel.v1.MsgTimeoutOnClose",
    "/ibc.core.client.v1.MsgCreateClient",
    "/ibc.core.client.v1.MsgSubmitMisbehaviour",
    "/ibc.core.client.v1.MsgUpdateClient",
    "/ibc.core.client.v1.MsgUpgradeClient",
    "/ibc.core.connection.v1.MsgConnectionOpenAck",
    "/ibc.core.connection.v1.MsgConnectionOpenConfirm",
    "/ibc.core.connection.v1.MsgConnectionOpenInit",
    "/ibc.core.connection.v1.MsgConnectionOpenTry",
    # vestingTypes
    "/cosmos.vesting.v1beta1.MsgCreateVestingAccount",
}

ENGINE_EXTENSIONS = {
    "/cosmwasm.wasm.v1.MsgExecuteContract",
    "/cosmwasm.wasm.v1.MsgInstantiateContract",
    "/cosmos.slashing.v1beta1.MsgUnjail",
    "/cosmos.crisis.v1beta1.MsgVerifyInvariant",
    "/cosmos.evidence.v1beta1.MsgSubmitEvidence",
    "/cosmos.vesting.v1beta1.MsgCreatePermanentLockedAccount",
    "/cosmos.vesting.v1beta1.MsgCreatePeriodicVestingAccount",
}


def test_registry_covers_pinned_cosmjs_membership():
    """Every Msg member of the pinned defaultRegistryTypes must be a
    registered top-level type of the wire-decode registry."""
    from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
        _REGISTRY_URLS,
    )

    registered = set(_REGISTRY_URLS)
    missing = sorted(COSMJS_DEFAULT_REGISTRY_MSGS - registered)
    assert not missing, f"cosmjs members not registered: {missing}"


def test_registry_extras_are_exactly_the_documented_extensions():
    """The engine may exceed the pin only by the documented extension
    set — an undocumented registration fails here so the membership
    story stays auditable round over round."""
    from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
        _REGISTRY_URLS,
    )

    extras = set(_REGISTRY_URLS) - COSMJS_DEFAULT_REGISTRY_MSGS
    assert extras == ENGINE_EXTENSIONS


def test_membership_count_matches_grid():
    """67 registered types = 60 cosmjs Msg members + 7 extensions, and
    the synthesis grid has a kind for every one of them plus the
    unknown-fallback band."""
    from zigchain_indexer_clickhouse_spark.sources.tx_decode import (
        _REGISTRY_MOD,
        _REGISTRY_URLS,
    )

    assert len(COSMJS_DEFAULT_REGISTRY_MSGS) == 60
    assert len(_REGISTRY_URLS) == 67
    assert len(set(_REGISTRY_URLS)) == 67  # no duplicate registrations
    assert _REGISTRY_MOD > len(_REGISTRY_URLS)  # unknown band non-empty
