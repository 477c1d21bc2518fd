"""Configurable conflict-resolution policies for the MERGE path.

Re-expresses the reference's ``ConflictResolutionType`` catalog
(api:conf/types/ConflictResolutionType.java:1-47; decision procedure
api:model/EtlDatabaseObject.java:614-726; config keys README.md:304-309) as a
single Catalyst predicate evaluated per matched (dst, src) pair inside the
one-pass merge join — no per-row Python, no second scan:

- ``NEWER_WINS`` (ours, the default): src applies iff ``s.lsn > d._lsn`` —
  the engine's total-order generalization of ``observationDateFields``.
- ``KEEP_EXISTING``: a matched live row is never overwritten
  (api:model/EtlDatabaseObject.java — existing record found → no-op).
- ``UPDATE_EXISTING``: a matched live row is always overwritten.
- ``WINNING_FIELDS``: src wins iff its fields match configured winning
  values — ``winningRecordFieldsInfo`` is a list of AND-groups, OR-combined
  (api:model/EtlDatabaseObject.java:614-676).
- ``OBSERVATION_DATES``: src wins iff **any** configured date column is
  strictly newer than dst's (a null dst date loses, a null src date cannot
  win) — ``observationDateFields`` (api:model/EtlDatabaseObject.java:677-714).

Scope: policies govern **I/U events against live dst rows**. Two cases always
fall back to the lsn guard instead:

- **src is a delete** — DELETE is a separately dispatched action in the
  reference (api:etl/model/EtlLoadHelper.java:274-300), not an upsert
  conflict; a ``KEEP_EXISTING`` table would otherwise become undeletable.
- **dst is a tombstone** — the reference resolves conflicts only against
  records that *exist* in the destination (lookup by PK/unique keys,
  api:model/pojo/generic/DatabaseObjectDAO.java:247-290); a deleted row is
  not found, so the incoming row inserts. Our tombstones are invisible to
  users but matched by the merge join, so the lsn guard decides: a
  genuinely-newer reinsert resurrects the key, a stale out-of-order insert
  stays fenced. Without this, ``KEEP_EXISTING`` would make deletion
  permanent (the tombstone would "win" forever).

The losing action is labeled ``policy_keep`` (the analog of the dst-stage
``conflict_resolution_type = KEPT_EXISTING`` ledger column,
api:conf/interfaces/TableConfiguration.java:2343-2380) for explicit policies
and ``stale_skip`` for the default lsn guard, so metrics distinguish
policy-kept rows from out-of-order-stale rows (and from ``keep`` = untouched
dst rows that merely shared a rewritten partition).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ConflictPolicy:
    """How a matched (dst live row, src event) pair is resolved.

    ``kind`` ∈ {"newer_wins", "keep_existing", "update_existing",
    "winning_fields", "observation_dates"}.

    ``winning_groups`` (winning_fields): OR of AND-groups; each group maps
    src column → required value (null-safe equality).

    ``observation_fields`` (observation_dates): src payload columns compared
    against the dst columns of the same name.
    """

    kind: str = "newer_wins"
    winning_groups: Sequence[Mapping[str, object]] = field(default_factory=tuple)
    observation_fields: Sequence[str] = field(default_factory=tuple)

    def __post_init__(self):
        kinds = ("newer_wins", "keep_existing", "update_existing", "winning_fields", "observation_dates")
        if self.kind not in kinds:
            raise ValueError(f"unknown conflict policy {self.kind!r}; expected one of {kinds}")
        if self.kind == "winning_fields" and not self.winning_groups:
            raise ValueError("winning_fields policy requires at least one winning group")
        if self.kind == "observation_dates" and not self.observation_fields:
            raise ValueError("observation_dates policy requires at least one field")

    @property
    def is_default(self) -> bool:
        return self.kind == "newer_wins"

    @property
    def loss_action(self) -> str:
        """Metrics label when src loses against a matched live row —
        ``policy_keep`` (KEPT_EXISTING ledger analog) for explicit policies,
        ``stale_skip`` for the default lsn guard, so metrics separate
        policy-kept rows from out-of-order-stale ones."""
        return "stale_skip" if self.is_default else "policy_keep"

    def src_wins(self, src: str = "s", dst: str = "d") -> Column:
        """Predicate: does the src event overwrite a matched *live* dst row?

        Evaluated with the merge join's aliases; never consulted for
        tombstoned dst rows (those use the lsn guard, see module docstring).
        """
        lsn_newer = F.col(f"{src}.lsn") > F.coalesce(F.col(f"{dst}._lsn"), F.lit(-1))
        if self.kind == "newer_wins":
            return lsn_newer
        if self.kind == "keep_existing":
            return F.lit(False)
        if self.kind == "update_existing":
            return F.lit(True)
        if self.kind == "winning_fields":
            groups = [
                _and_all(
                    F.col(f"{src}.{c}").eqNullSafe(F.lit(v)) for c, v in sorted(group.items())
                )
                for group in self.winning_groups
            ]
            return _or_all(groups)
        # observation_dates: any src date strictly newer; null dst loses,
        # null src cannot win (api:model/EtlDatabaseObject.java:677-714)
        branches = [
            F.col(f"{src}.{c}").isNotNull()
            & (
                F.col(f"{dst}.{c}").isNull()
                | (F.col(f"{src}.{c}") > F.col(f"{dst}.{c}"))
            )
            for c in self.observation_fields
        ]
        return _or_all(branches)


def _and_all(cols) -> Column:
    out = None
    for c in cols:
        out = c if out is None else (out & c)
    return F.lit(True) if out is None else out


def _or_all(cols) -> Column:
    out = None
    for c in cols:
        out = c if out is None else (out | c)
    return F.lit(False) if out is None else out


NEWER_WINS = ConflictPolicy()
KEEP_EXISTING = ConflictPolicy(kind="keep_existing")
UPDATE_EXISTING = ConflictPolicy(kind="update_existing")
