"""Pure-Python Delta-style transaction log over parquet.

The one reference capability plain directories cannot serve is the
managed-format commit protocol: the reference writes Delta
(/root/reference/jobs/bronze/ingest_csv_to_delta.py:68-72) and Iceberg
(/root/reference/jobs/silver/claims_to_iceberg.py:131), whose value is
*atomic multi-file commits* and *time travel* — not the parquet bytes.
The jars are unobtainable in this container (BASELINE.md §managed-format),
so this module re-implements the protocol itself, Spark-first:

- A table is a directory of immutable parquet data files plus a
  ``_delta_log/`` directory of ordered JSON commit files
  (``00000000000000000000.json``, one per version), each holding
  newline-delimited actions in the published Delta protocol dialect
  (delta-io PROTOCOL.md): ``protocol``, ``metaData`` (id / format /
  schemaString / partitionColumns / configuration / createdTime),
  ``add`` (path, partitionValues, size, modificationTime, dataChange),
  ``remove`` (path, deletionTimestamp, dataChange), ``txn`` (appId,
  version), ``cdc`` (change-data files), ``commitInfo``. Timestamps in
  the log are epoch **milliseconds** (the spec's unit); the Python API
  keeps epoch seconds. Checkpoints are parquet files
  (``<v>.checkpoint.parquet``, one action per row in the spec's
  add/remove/metaData/protocol/txn column layout) advertised by
  ``_last_checkpoint`` — so a table this module writes is structurally
  readable by external Delta readers the day format jars appear.
- **Atomicity**: data files are staged and moved into the table dir
  FIRST (invisible to readers — only the log defines the table), then
  the commit file is published with ``os.link(tmp, commit)``, which is
  atomic and fails with EEXIST if the version was taken. A crash at any
  earlier point leaves orphan data files (cleaned by ``vacuum``) and a
  table still readable at the prior version.
- **Optimistic concurrency**: writers read the latest version, prepare,
  then CAS on the commit file. Losers of the race re-check: blind
  appends rebase and retry; read-modify-write commits (overwrite,
  upsert, compact) raise ``ConcurrentModification`` because their
  premise (the snapshot they read) is stale.
- **Time travel**: ``read(version=N)`` replays the log to N;
  ``history()`` lists commits. Every 10 commits a
  ``*.checkpoint.json`` snapshot of the full live set bounds replay
  cost — at 100 TB / millions of commits the log read is
  O(checkpoint + tail), exactly Delta's shape.

Scale notes: the log is driver-side *metadata* — O(live files), never
O(rows) — and the data plane stays a plain distributed parquet
scan/write. Partition pruning happens log-side (filter ``add`` actions
by partitionValues before handing Spark the file list) so a pruned read
never even lists the skipped files. This mirrors how Delta/Iceberg
scale reads: metadata pruning first, then Spark's normal splittable
scan over the surviving files.
"""

from __future__ import annotations

import json
import re
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_DIR = "_delta_log"  # the spec's log directory name
CDF_DIR = "_change_data"  # the spec's CDF directory name
CHECKPOINT_EVERY = 10
_VLEN = 20  # zero-padded version width -> lexicographic == numeric order
# Published protocol action: reader 1 / writer 2 is classic parquet Delta
# with no table features — the widest-compat floor.
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}
_LAST_CHECKPOINT = "_last_checkpoint"
# internal op -> (spec history operation name, operationParameters)
_OPERATIONS = {
    "append": ("WRITE", {"mode": "Append"}),
    "overwrite": ("WRITE", {"mode": "Overwrite"}),
    "upsert": ("MERGE", {}),
    "compact": ("OPTIMIZE", {}),
    "delete": ("DELETE", {}),
    "update": ("UPDATE", {}),
    "restore": ("RESTORE", {}),
    "clone": ("CLONE", {"isShallow": "true"}),
    "addConstraint": ("ADD CONSTRAINT", {}),
    "dropConstraint": ("DROP CONSTRAINT", {}),
}


def _check_constraints(df: DataFrame, cons: dict[str, str]) -> None:
    """One aggregate pass counting violations of every CHECK constraint
    (SQL semantics: a row violates only when the expression is FALSE —
    NULL satisfies). Raises ConstraintViolation naming each failed
    constraint with its violation count."""
    if not cons:
        return
    names = sorted(cons)
    aggs = [
        F.sum(
            F.when(
                ~F.coalesce(F.expr(cons[n]).cast("boolean"), F.lit(True)), 1
            ).otherwise(0)
        ).alias(n)
        for n in names
    ]
    row = df.agg(*aggs).first()
    bad = {n: int(row[n]) for n in names if row[n]}
    if bad:
        detail = ", ".join(f"{n} ({cons[n]!r}): {c} rows" for n, c in bad.items())
        raise ConstraintViolation(f"CHECK constraint(s) violated — {detail}")


class ConcurrentModification(Exception):
    """A read-modify-write commit lost the optimistic-concurrency race:
    another writer committed after our snapshot was taken, so replaying
    our actions could drop their changes. Callers retry the whole
    operation from a fresh snapshot."""


class NoSuchVersion(Exception):
    pass


class ConstraintViolation(Exception):
    """A write batch contains rows failing a table CHECK constraint —
    the commit is refused and nothing (data or log) is published."""


def _commit_name(v: int) -> str:
    return f"{v:0{_VLEN}d}.json"


def _remove_action(path: str) -> dict[str, Any]:
    return {
        "remove": {
            "path": path,
            "deletionTimestamp": int(time.time() * 1000),
            "dataChange": True,
        }
    }


def _meta_action(
    snap: Snapshot | None,
    schema: StructType,
    partition_by: tuple[str, ...],
    configuration: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Spec-shaped metaData action; the id and createdTime are minted on
    the table's first commit and carried verbatim afterwards, as is the
    configuration map (constraints live there) unless explicitly
    replaced."""
    if configuration is None:
        configuration = dict(snap.configuration) if snap else {}
    return {
        "metaData": {
            "id": (snap.meta_id if snap and snap.meta_id else uuid.uuid4().hex),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": list(partition_by),
            "configuration": configuration,
            "createdTime": (
                snap.created_ms
                if snap and snap.created_ms is not None
                else int(time.time() * 1000)
            ),
        }
    }


def _checkpoint_name(v: int) -> str:
    return f"{v:0{_VLEN}d}.checkpoint.parquet"


def _stats_value(v: Any) -> Any:
    """Parquet-footer statistic → JSON-encodable Delta stats value."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, _Dec):
        return str(v)
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def _file_stats(path: str) -> str | None:
    """Delta-spec per-file stats JSON (numRecords / minValues /
    maxValues / nullCount) from the parquet FOOTER — no data read, no
    extra Spark job; row-group statistics are already there. Nested
    columns are skipped (top-level skipping covers the pruning
    predicates the reader supports)."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return None
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    for ci in range(md.num_columns):
        col = md.schema.column(ci)
        name = col.path
        if "." in name:
            continue
        mn = mx = None
        nc = 0
        have = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None:
                have = False
                break
            nc += st.null_count or 0
            if not st.has_min_max:
                have = False
                break
            if mn is None or st.min < mn:
                mn = st.min
            if mx is None or st.max > mx:
                mx = st.max
        nulls[name] = nc
        if have and mn is not None:
            jmn, jmx = _stats_value(mn), _stats_value(mx)
            if jmn is not None and jmx is not None:
                mins[name] = jmn
                maxs[name] = jmx
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        }
    )


_CONJUNCT_RE = re.compile(r"\s*(\w+)\s*(<=|>=|!=|=|<|>)\s*(.+?)\s*$")


def _parse_conjuncts(where: str) -> list[tuple[str, str, Any]] | None:
    """Parse `col op literal [AND ...]` into pruning conjuncts; None if
    any piece is out of the supported fragment (pruning then degrades
    to scanning every file — correctness never depends on it)."""
    out: list[tuple[str, str, Any]] = []
    for part in re.split(r"(?i)\s+and\s+", where.strip()):
        m = _CONJUNCT_RE.fullmatch(part)
        if m is None:
            return None
        col, op, lit = m.groups()
        val: Any
        if len(lit) >= 2 and lit[0] == "'" and lit[-1] == "'":
            val = lit[1:-1]
        else:
            try:
                val = float(lit) if ("." in lit or "e" in lit.lower()) else int(lit)
            except ValueError:
                return None
        out.append((col, op, val))
    return out


def _file_may_match(stats_json: str | None, conjuncts: list[tuple[str, str, Any]]) -> bool:
    """Conservative range check of one file's stats against pruning
    conjuncts: False only when a conjunct is provably unsatisfiable for
    every row in the file."""
    if not stats_json:
        return True
    try:
        s = json.loads(stats_json)
    except (TypeError, ValueError):
        return True
    mins, maxs = s.get("minValues", {}), s.get("maxValues", {})
    for col, op, val in conjuncts:
        mn, mx = mins.get(col), maxs.get(col)
        if mn is None or mx is None:
            continue
        numeric = isinstance(val, (int, float)) and not isinstance(val, bool)
        if numeric != (isinstance(mn, (int, float)) and not isinstance(mn, bool)):
            continue  # type mismatch — don't prune
        if op == "=":
            ok = mn <= val <= mx
        elif op == "<":
            ok = mn < val
        elif op == "<=":
            ok = mn <= val
        elif op == ">":
            ok = mx > val
        elif op == ">=":
            ok = mx >= val
        else:  # !=
            ok = not (mn == mx == val)
        if not ok:
            return False
    return True


@dataclass
class Snapshot:
    version: int
    schema_json: str | None
    partition_by: tuple[str, ...]
    # rel path -> add action dict (path, size, partitionValues)
    files: dict[str, dict[str, Any]]
    timestamp: float
    # appId -> highest committed transaction version (Delta txn action):
    # the idempotence ledger for external retry loops (streaming batches)
    txns: dict[str, int]
    # the table's stable metaData.id (spec: a GUID minted at creation and
    # carried verbatim through every later metaData action)
    meta_id: str | None = None
    created_ms: int | None = None
    # metaData.configuration — carries delta.constraints.<name> entries
    configuration: dict[str, str] = field(default_factory=dict)

    @property
    def constraints(self) -> dict[str, str]:
        """name -> CHECK expression, from delta.constraints.* config."""
        pre = "delta.constraints."
        return {
            k[len(pre):]: v
            for k, v in self.configuration.items()
            if k.startswith(pre)
        }

    @property
    def schema(self) -> StructType | None:
        return StructType.fromJson(json.loads(self.schema_json)) if self.schema_json else None


@dataclass
class TxTable:
    """Handle on one transaction-logged table rooted at ``path``."""

    path: str

    # ------------------------------------------------------------------ log IO

    @property
    def log_dir(self) -> str:
        return os.path.join(self.path, LOG_DIR)

    def exists(self) -> bool:
        return os.path.isdir(self.log_dir) and self.latest_version() is not None

    def _log_entries(self) -> list[str]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(os.listdir(self.log_dir))

    def latest_version(self) -> int | None:
        vs = [int(e[:_VLEN]) for e in self._log_entries() if e.endswith(".json") and not e.endswith(".checkpoint.json") and e[:_VLEN].isdigit()]
        return max(vs) if vs else None

    def _read_actions(self, version: int) -> list[dict[str, Any]]:
        p = os.path.join(self.log_dir, _commit_name(version))
        with open(p) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Reconstruct the live file set at ``version`` (default: latest)
        by replaying the log from the newest checkpoint <= version."""
        latest = self.latest_version()
        if latest is None:
            raise NoSuchVersion(f"{self.path}: no transaction log")
        v = latest if version is None else version
        if v > latest or v < 0:
            raise NoSuchVersion(f"{self.path}: version {v} (latest {latest})")

        # Discover checkpoints by listing (not by trusting _last_checkpoint:
        # that file is a hint for external readers and may be stale after a
        # crash — the spec says readers must tolerate that).
        ckpts = [
            int(e[:_VLEN])
            for e in self._log_entries()
            if e.endswith(".checkpoint.parquet") and int(e[:_VLEN]) <= v
        ]
        files: dict[str, dict[str, Any]] = {}
        schema_json: str | None = None
        partition_by: tuple[str, ...] = ()
        meta_id: str | None = None
        ts = 0.0
        txns: dict[str, int] = {}
        configuration: dict[str, str] = {}
        start = 0
        if ckpts:
            cv = max(ckpts)
            actions = _read_checkpoint(os.path.join(self.log_dir, _checkpoint_name(cv)))
            start = cv + 1
        else:
            actions = []
        for cur in range(start, v + 1):
            actions = actions + self._read_actions(cur)
        created_ms: int | None = None
        for action in actions:
            if action.get("metaData") is not None:
                md = action["metaData"]
                schema_json = md.get("schemaString", schema_json)
                partition_by = tuple(md.get("partitionColumns") or partition_by)
                meta_id = md.get("id", meta_id)
                created_ms = md.get("createdTime", created_ms)
                configuration = dict(md.get("configuration") or {})
            elif action.get("add") is not None:
                files[action["add"]["path"]] = action["add"]
            elif action.get("remove") is not None:
                files.pop(action["remove"]["path"], None)
            elif action.get("commitInfo") is not None:
                ts = action["commitInfo"].get("timestamp", ts * 1000.0) / 1000.0
            elif action.get("txn") is not None:
                t = action["txn"]
                txns[t["appId"]] = max(txns.get(t["appId"], -1), t["version"])
            # protocol / cdc actions carry no snapshot state
        return Snapshot(
            v,
            schema_json,
            partition_by,
            files,
            ts,
            txns,
            meta_id,
            created_ms,
            configuration,
        )

    def history(self) -> list[dict[str, Any]]:
        """Commit metadata, newest first — Delta's DESCRIBE HISTORY."""
        latest = self.latest_version()
        out = []
        for v in range((latest if latest is not None else -1), -1, -1):
            info = dict(
                next(
                    (a["commitInfo"] for a in self._read_actions(v) if "commitInfo" in a),
                    {},
                )
            )
            if "timestamp" in info:  # log stores ms (spec); API speaks seconds
                info["timestamp"] = info["timestamp"] / 1000.0
            out.append({"version": v, **info})
        return out

    def version_at(self, timestamp: float) -> int:
        """Greatest version whose commit timestamp <= ``timestamp``
        (time-travel-by-timestamp resolution)."""
        best = None
        for h in self.history():
            if h.get("timestamp", float("inf")) <= timestamp:
                best = h["version"]
                break  # history is newest-first
        if best is None:
            raise NoSuchVersion(f"{self.path}: no commit at or before {timestamp}")
        return best

    def txn_version(self, app_id: str) -> int | None:
        """Highest transaction version committed for ``app_id``, or None
        if the app never committed (or the table has no log). The replay
        guard for external at-least-once drivers: skip work whose
        version is <= this."""
        if not self.exists():
            return None
        return self.snapshot().txns.get(app_id)

    # ------------------------------------------------------------- committing

    def _try_commit(self, version: int, actions: list[dict[str, Any]]) -> bool:
        """Atomically publish ``actions`` as ``version``. The os.link CAS
        is the transaction point: it either creates the commit file
        whole (the tmp file is fully written + fsynced first) or fails
        EEXIST because another writer took the version."""
        os.makedirs(self.log_dir, exist_ok=True)
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a, separators=(",", ":")) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        target = os.path.join(self.log_dir, _commit_name(version))
        try:
            os.link(tmp, target)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def _commit(
        self,
        read_version: int | None,
        actions: list[dict[str, Any]],
        operation: str,
    ) -> int:
        """Single CAS attempt at ``read_version + 1``. Raises
        ConcurrentModification if that version was taken — callers whose
        actions don't depend on the snapshot (blind appends) catch it,
        rebase on the new latest, and retry."""
        attempt = (read_version if read_version is not None else -1) + 1
        op, params = _OPERATIONS.get(operation, (operation, {}))
        info = {
            "commitInfo": {
                "operation": op,
                "operationParameters": params,
                "timestamp": int(time.time() * 1000),
                "readVersion": read_version,
            }
        }
        if not self._try_commit(attempt, actions + [info]):
            raise ConcurrentModification(
                f"{self.path}: version {attempt} committed by another writer "
                f"after snapshot v{read_version} was taken"
            )
        if (attempt + 1) % CHECKPOINT_EVERY == 0:
            self._write_checkpoint(attempt)
        return attempt

    def _write_checkpoint(self, version: int) -> None:
        """Spec-shaped parquet checkpoint: one action per row, columns
        ``protocol`` / ``metaData`` / ``txn`` / ``add`` / ``remove``, plus
        the ``_last_checkpoint`` pointer file external readers use to skip
        the log prefix. Written driver-side with pyarrow (the state is
        O(live files) metadata, never rows)."""
        snap = self.snapshot(version)
        rows: list[dict[str, Any]] = [{"protocol": dict(PROTOCOL)}]
        rows.append(
            {
                "metaData": {
                    "id": snap.meta_id or uuid.uuid4().hex,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": snap.schema_json or "",
                    "partitionColumns": list(snap.partition_by),
                    "configuration": dict(snap.configuration),
                    "createdTime": (
                        snap.created_ms
                        if snap.created_ms is not None
                        else int(snap.timestamp * 1000)
                    ),
                }
            }
        )
        rows += [{"txn": {"appId": a, "version": v}} for a, v in sorted(snap.txns.items())]
        rows += [{"add": dict(a)} for a in sorted(snap.files.values(), key=lambda a: a["path"])]
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.parquet")
        _write_checkpoint_parquet(tmp, rows)
        # Checkpoints are derived data — last writer wins is fine.
        os.replace(tmp, os.path.join(self.log_dir, _checkpoint_name(version)))
        ptr = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(ptr, "w") as fh:
            json.dump({"version": version, "size": len(rows)}, fh)
        os.replace(ptr, os.path.join(self.log_dir, _LAST_CHECKPOINT))

    # ------------------------------------------------------------- data plane

    def _stage_files(
        self, df: DataFrame, partition_by: tuple[str, ...]
    ) -> list[dict[str, Any]]:
        """Write ``df``'s files into the table directory (Hive layout when
        partitioned) WITHOUT publishing them, returning their add
        actions. Files are written to a staging dir then renamed in —
        rename keeps Spark's unique part-file names, so concurrent
        stagers never collide, and unpublished files are invisible
        because readers only trust the log."""
        staging = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        w = df.write.format("parquet").mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(staging)
        adds: list[dict[str, Any]] = []
        for root, _dirs, names in os.walk(staging):
            for name in names:
                if name.startswith(("_", ".")):
                    continue
                src = os.path.join(root, name)
                rel = os.path.relpath(src, staging)
                part_values = {
                    seg.split("=", 1)[0]: seg.split("=", 1)[1]
                    for seg in rel.split(os.sep)[:-1]
                    if "=" in seg
                }
                dst = os.path.join(self.path, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(src, dst)
                add: dict[str, Any] = {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": part_values,
                    "size": os.path.getsize(dst),
                    "modificationTime": int(os.path.getmtime(dst) * 1000),
                    "dataChange": True,
                }
                stats = _file_stats(dst)
                if stats is not None:
                    add["stats"] = stats
                adds.append({"add": add})
        shutil.rmtree(staging)
        return adds

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        partition_by: tuple[str, ...] = (),
        txn: tuple[str, int] | list[tuple[str, int]] | None = None,
        cdf: bool = False,
    ) -> int:
        """Atomic multi-file append/overwrite — the transactional
        equivalent of the reference's Delta append w/ mergeSchema
        (/root/reference/jobs/bronze/ingest_csv_to_delta.py:68-72).
        Returns the committed version.

        ``txn=(app_id, version)`` stamps the commit with a transaction
        marker (Delta's txn action): the data files and the marker
        publish in the SAME atomic commit, so a crashed driver that
        replays the write can detect it via :meth:`txn_version` — the
        data either landed with its marker or neither did."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        staged: list[dict[str, Any]] | None = None
        cdf_files: list[tuple[str, int]] | None = None
        cdf_staged_for: int | None = None
        while True:
            read_version = self.latest_version()
            if read_version is not None:
                snap = self.snapshot(read_version)
                partition_by = tuple(partition_by) or snap.partition_by
                if tuple(partition_by) != snap.partition_by:
                    raise ValueError(
                        f"partition_by {partition_by} != table's {snap.partition_by}"
                    )
                # mergeSchema semantics: later appends may add columns; the
                # union schema becomes the table schema (old files surface
                # NULL for new columns at read, exactly Delta's behavior).
                old = snap.schema
                new_schema = _merge_schemas(old, df.schema) if old else df.schema
            else:
                snap = None
                new_schema = df.schema
            if staged is None:  # stage once; retries only recompute the log side
                if snap is not None:
                    _check_constraints(df, snap.constraints)
                staged = self._stage_files(df, tuple(partition_by))
            if cdf and (cdf_files is None or cdf_staged_for != read_version):
                # The delete preimage is a function of read_version, so
                # it must be (re)staged whenever the rebased snapshot
                # moves — a retry that recomputed the remove actions
                # against a newer snapshot while keeping a stale delete
                # preimage would make the feed disagree with the commit
                # (ADVICE r3; overwrite currently never retries, but the
                # invariant is cheap to hold unconditionally).
                changes = df.withColumn("_change_type", F.lit("insert"))
                if mode == "overwrite" and snap is not None:
                    old = self.read(df.sparkSession, version=read_version)
                    changes = old.withColumn(
                        "_change_type", F.lit("delete")
                    ).unionByName(changes, allowMissingColumns=True)
                cdf_files = self._stage_changes(changes)
                cdf_staged_for = read_version
            actions: list[dict[str, Any]] = []
            if read_version is None:
                actions.append({"protocol": dict(PROTOCOL)})
            actions.append(_meta_action(snap, new_schema, tuple(partition_by)))
            if mode == "overwrite" and snap is not None:
                actions += [_remove_action(p) for p in snap.files]
            actions += staged
            if txn is not None:
                marks = [txn] if isinstance(txn, tuple) else list(txn)
                actions += [
                    {"txn": {"appId": a, "version": v}} for a, v in marks
                ]
            if cdf and cdf_files is not None:
                actions += [
                    {
                        "cdc": {
                            "path": p,
                            "partitionValues": {},
                            "size": sz,
                            "dataChange": False,
                        }
                    }
                    for p, sz in cdf_files
                ]
            try:
                return self._commit(read_version, actions, mode)
            except ConcurrentModification:
                if mode == "overwrite":
                    raise
                # Blind append: rebase on the new latest (re-merging the
                # schema against whatever the winner committed) and retry.
                continue

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        asof_timestamp: float | None = None,
        partition_filter: Callable[[dict[str, str]], bool] | None = None,
        where: str | None = None,
    ) -> DataFrame:
        """Snapshot read, optionally time-travelled. ``partition_filter``
        prunes add actions by their partitionValues BEFORE Spark sees a
        file list — log-side partition pruning, so a pruned 100 TB read
        plans over only the surviving files.

        ``where`` (e.g. ``"amount > 100 AND status = 'OPEN'"``) is
        Delta-style DATA SKIPPING: files whose footer min/max stats
        prove no row can match are dropped from the plan entirely, then
        the predicate is ALSO applied row-level — pruning is a pure
        optimization, never a correctness dependency, and predicates
        outside the supported `col op literal AND ...` fragment simply
        skip the pruning step."""
        if asof_timestamp is not None:
            version = self.version_at(asof_timestamp)
        snap = self.snapshot(version)
        adds = list(snap.files.values())
        if partition_filter is not None:
            adds = [a for a in adds if partition_filter(a.get("partitionValues", {}))]
        if where is not None:
            conjuncts = _parse_conjuncts(where)
            if conjuncts is not None:
                adds = [a for a in adds if _file_may_match(a.get("stats"), conjuncts)]
        if not adds:
            schema = snap.schema
            df = spark.createDataFrame([], schema if schema else "dummy INT")
            return df.filter(where) if where is not None else df
        df = self._read_adds(spark, snap, adds)
        return df.filter(where) if where is not None else df

    def _read_adds(
        self, spark: SparkSession, snap: Snapshot, adds: list[dict[str, Any]]
    ) -> DataFrame:
        """Materialize a DataFrame over a list of add actions.

        Table-relative paths read under ``basePath`` so Hive partition
        columns re-infer from the directory layout; ABSOLUTE paths
        (shallow-clone references into another table's root, where
        basePath cannot be a prefix) read log-driven instead — grouped
        by their ``partitionValues`` and the partition columns restored
        from the LOG, which is how a spec Delta reader resolves
        partition columns anyway. The log's schema is passed explicitly:
        no footer-sampling inference job, and pre-evolution files
        surface NULL for later-added columns (per-file column
        resolution) — exactly Delta's read path, where the log owns the
        schema."""
        schema = snap.schema
        internal = [a for a in adds if not os.path.isabs(a["path"])]
        external = [a for a in adds if os.path.isabs(a["path"])]
        dfs: list[DataFrame] = []
        if internal:
            reader = spark.read.option("basePath", self.path)
            if schema is not None:
                reader = reader.schema(schema)
            dfs.append(
                reader.parquet(
                    *[os.path.join(self.path, a["path"]) for a in internal]
                )
            )
        if external:
            pcols = tuple(snap.partition_by)
            data_schema = (
                StructType([f for f in schema.fields if f.name not in pcols])
                if schema is not None and pcols
                else schema
            )
            groups: dict[tuple, list[str]] = {}
            for a in external:
                key = tuple(sorted((a.get("partitionValues") or {}).items()))
                groups.setdefault(key, []).append(a["path"])
            for key, paths in groups.items():
                rd = spark.read
                if data_schema is not None:
                    rd = rd.schema(data_schema)
                d = rd.parquet(*paths)
                for c, val in key:
                    typ = schema[c].dataType if schema is not None else "string"
                    d = d.withColumn(c, F.lit(val).cast(typ))
                if schema is not None:
                    d = d.select(*[f.name for f in schema.fields])
                dfs.append(d)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # --------------------------------------------------- maintenance commits

    def upsert_by_key(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key_cols: tuple[str, ...],
        order_col: str | None = None,
        txn: tuple[str, int] | None = None,
        cdf: bool = False,
    ) -> dict[str, int]:
        """MERGE (WHEN MATCHED UPDATE / NOT MATCHED INSERT) with a truly
        atomic commit: rewritten files and their removals publish in ONE
        log entry, so readers see either the whole merge or none of it —
        the guarantee io.upsert_by_key's per-partition rename swap
        cannot give (io.py:306-312 documents that gap; this closes it).

        Only files in partitions touched by ``updates`` are rewritten;
        untouched files carry over by reference (zero IO). Raises
        ConcurrentModification if another writer commits between our
        snapshot and our commit.

        ``txn=(app_id, version)`` makes the merge IDEMPOTENT under
        at-least-once replay: if the log already records ``app_id`` at
        ``version`` or later the call is a no-op, and otherwise the
        marker commits atomically WITH the merged files — exactly
        Delta's txnAppId/txnVersion protocol for foreachBatch sinks.

        ``cdf=True`` records the merge's change rows (update_preimage /
        update_postimage for matched keys, insert for new keys) in the
        same atomic commit, for :meth:`table_changes`."""
        if not self.exists():
            n = updates.count()
            self.write(updates, mode="append", txn=txn, cdf=cdf)
            return {"matched": 0, "inserted": n}
        read_version = self.latest_version()
        snap = self.snapshot(read_version)
        if txn is not None and snap.txns.get(txn[0], -1) >= txn[1]:
            return {"matched": 0, "inserted": 0, "skipped_replay": 1}

        if order_col is not None:
            from pyspark.sql import Window

            rn = F.row_number().over(
                Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
            )
            updates = updates.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
        updates = updates.persist()
        try:
            n_updates = updates.count()
            if order_col is None:
                n_keys = updates.select(*key_cols).distinct().count()
                if n_keys != n_updates:
                    raise ValueError(
                        f"update batch has {n_updates - n_keys} duplicate key(s); "
                        "pass order_col to pick a winner"
                    )
            if n_updates == 0:
                return {"matched": 0, "inserted": 0}

            part_by = snap.partition_by
            if part_by:
                from urllib.parse import unquote

                touched = {
                    tuple(
                        str(r[c]) if r[c] is not None else "__HIVE_DEFAULT_PARTITION__"
                        for c in part_by
                    )
                    for r in updates.select(*part_by).distinct().collect()
                }

                # partitionValues come from Hive dir names, which Spark
                # percent-escapes; unquote before comparing so e.g. a
                # space in a partition value still matches.
                def in_touched(pv: dict[str, str]) -> bool:
                    return tuple(unquote(pv.get(c, "")) for c in part_by) in touched

            else:

                def in_touched(pv: dict[str, str]) -> bool:
                    return True

            rewrite = [a for a in snap.files.values() if in_touched(a["partitionValues"])]
            pre = None
            if rewrite:
                # read() projects to the log schema, so pre-evolution
                # files surface NULLs instead of schema-mismatched reads.
                existing = self.read(
                    spark, version=read_version, partition_filter=in_touched
                )
                pre = existing.join(
                    updates.select(*key_cols), list(key_cols), "left_semi"
                ).persist()
                matched = pre.count()
                kept = existing.join(
                    updates.select(*key_cols), list(key_cols), "left_anti"
                )
                merged = kept.unionByName(updates, allowMissingColumns=True)
            else:
                matched = 0
                merged = updates
            new_schema = _merge_schemas(snap.schema, updates.schema)
            _check_constraints(updates, snap.constraints)
            adds = self._stage_files(merged, part_by)
            actions: list[dict[str, Any]] = [
                _meta_action(snap, new_schema, part_by)
            ]
            actions += [_remove_action(a["path"]) for a in rewrite] + adds
            if txn is not None:
                actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
            if cdf:
                matched_keys = (
                    pre.select(*key_cols) if pre is not None else None
                )
                if matched_keys is not None:
                    post = updates.join(matched_keys, list(key_cols), "left_semi")
                    ins = updates.join(matched_keys, list(key_cols), "left_anti")
                    changes = (
                        pre.withColumn("_change_type", F.lit("update_preimage"))
                        .unionByName(
                            post.withColumn("_change_type", F.lit("update_postimage")),
                            allowMissingColumns=True,
                        )
                        .unionByName(
                            ins.withColumn("_change_type", F.lit("insert")),
                            allowMissingColumns=True,
                        )
                    )
                else:
                    changes = updates.withColumn("_change_type", F.lit("insert"))
                actions += [
                    {
                        "cdc": {
                            "path": p,
                            "partitionValues": {},
                            "size": sz,
                            "dataChange": False,
                        }
                    }
                    for p, sz in self._stage_changes(changes)
                ]
            self._commit(read_version, actions, "upsert")
            if pre is not None:
                pre.unpersist()
            return {"matched": matched, "inserted": n_updates - matched}
        finally:
            updates.unpersist()

    def _rewrite_matching_files(
        self,
        spark: SparkSession,
        predicate,
        rewrite_row: Callable[[DataFrame], DataFrame],
        operation: str,
        cdf_changes: Callable[[DataFrame], DataFrame] | None,
    ) -> dict[str, int]:
        """Shared core of DELETE / UPDATE: locate the files that contain
        at least one matching row (file-level targeting via the parquet
        ``_metadata.file_path`` column — the same copy-on-write pruning
        Delta does), rewrite ONLY those files through ``rewrite_row``,
        and publish removes + adds (+ optional CDF batch) in one atomic
        commit. Untouched files carry over by reference — zero IO.
        Raises ConcurrentModification if another writer lands first."""
        read_version = self.latest_version()
        if read_version is None:
            raise NoSuchVersion(f"{self.path}: no transaction log")
        snap = self.snapshot(read_version)
        if not snap.files:
            return {"matched": 0, "rewritten_files": 0}
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        df = self.read(spark, version=read_version)
        touched_abs = [
            r[0]
            for r in df.filter(pred)
            .select(F.col("_metadata.file_path"))
            .distinct()
            .collect()
        ]
        # file_path is a file: URI over the absolute path; compare in
        # absolute space so shallow-clone references (absolute add
        # paths outside the table root) match too
        touched = {
            os.path.abspath(p.removeprefix("file://").removeprefix("file:"))
            for p in touched_abs
        }
        rewrite = [
            a
            for a in snap.files.values()
            if os.path.abspath(os.path.join(self.path, a["path"])) in touched
        ]
        if not rewrite:
            return {"matched": 0, "rewritten_files": 0}
        # re-read only the touched files, with the log schema
        sub = self._read_adds(spark, snap, rewrite)
        matched = sub.filter(pred).count()
        new_rows = rewrite_row(sub)
        if operation == "update":  # UPDATE can introduce violations; DELETE can't
            _check_constraints(new_rows, snap.constraints)
        adds = self._stage_files(new_rows, snap.partition_by)
        actions: list[dict[str, Any]] = (
            [_remove_action(a["path"]) for a in rewrite] + adds
        )
        if cdf_changes is not None:
            actions += [
                {
                    "cdc": {
                        "path": p,
                        "partitionValues": {},
                        "size": sz,
                        "dataChange": False,
                    }
                }
                for p, sz in self._stage_changes(cdf_changes(sub))
            ]
        self._commit(read_version, actions, operation)
        return {"matched": matched, "rewritten_files": len(rewrite)}

    def delete_where(
        self, spark: SparkSession, predicate, cdf: bool = False
    ) -> dict[str, int]:
        """Atomic DELETE (Delta's copy-on-write DELETE semantics): files
        holding matching rows are rewritten without them; everything
        publishes in one commit, so readers see all of the delete or
        none. ``cdf=True`` records the deleted rows as ``delete``
        change rows in the same commit."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._rewrite_matching_files(
            spark,
            pred,
            lambda sub: sub.filter(~pred),
            "delete",
            (lambda sub: sub.filter(pred).withColumn("_change_type", F.lit("delete")))
            if cdf
            else None,
        )

    def update_where(
        self,
        spark: SparkSession,
        predicate,
        set_exprs: dict[str, Any],
        cdf: bool = False,
    ) -> dict[str, int]:
        """Atomic UPDATE ... SET: rows matching ``predicate`` get each
        column in ``set_exprs`` replaced (values are Columns or SQL
        strings); non-matching rows in touched files are rewritten
        verbatim, untouched files carry over by reference. ``cdf=True``
        records update_preimage/update_postimage rows atomically."""
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        sets = {
            c: (F.expr(v) if isinstance(v, str) else v) for c, v in set_exprs.items()
        }

        def apply_update(sub: DataFrame) -> DataFrame:
            out = sub
            for c, v in sets.items():
                out = out.withColumn(c, F.when(pred, v).otherwise(F.col(c)))
            return out

        def changes(sub: DataFrame) -> DataFrame:
            pre = sub.filter(pred).withColumn("_change_type", F.lit("update_preimage"))
            post = apply_update(sub).filter(pred).withColumn(
                "_change_type", F.lit("update_postimage")
            )
            return pre.unionByName(post)

        return self._rewrite_matching_files(
            spark, pred, apply_update, "update", changes if cdf else None
        )

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
        zorder_by: tuple[str, ...] = (),
    ) -> tuple[int, int]:
        """OPTIMIZE [ZORDER BY]: rewrite the live set into ~target-sized
        files and swap the file list in one atomic commit. Readers
        mid-compaction keep the old snapshot; time travel to it keeps
        working until vacuum. Raises ConcurrentModification on a racing
        writer.

        ``zorder_by`` clusters the rewrite on the Morton interleaving of
        the given columns (io.zorder_layout), so each output file covers
        a tight hyper-rectangle in every listed dimension — composed
        with the footer stats every staged file records, ``read(where=
        ...)`` then prunes on ANY of those columns, which is the whole
        point of Delta's OPTIMIZE ZORDER.

        Concurrency follows Delta's OPTIMIZE conflict rules: losing the
        CAS race to commits that only ADD files (blind appends, txn
        markers) does NOT conflict — the rewrite is rebased and
        recommitted as-is, leaving the newly appended files live but
        uncompacted this round. A winner that REMOVED one of the files
        being rewritten (DELETE/UPDATE/another OPTIMIZE) or changed
        metadata invalidates the staged rewrite: compaction restarts
        from the new snapshot (the orphaned staged files are invisible
        to readers and reaped by vacuum)."""
        while True:
            read_version = self.latest_version()
            snap = self.snapshot(read_version)
            before = list(snap.files.values())
            before_paths = set(snap.files)
            total = sum(a["size"] for a in before)
            n_out = max(1, -(-total // target_file_bytes))
            df = self.read(spark, version=read_version)
            if zorder_by:
                from lakeflow.io import zorder_layout

                out = zorder_layout(df, tuple(zorder_by), partitions=n_out)
            else:
                out = df.repartition(n_out)
            adds = self._stage_files(out, snap.partition_by)
            actions = [_remove_action(a["path"]) for a in before] + adds
            base = read_version
            while True:
                try:
                    self._commit(base, actions, "compact")
                    return len(before), len(adds)
                except ConcurrentModification:
                    new_latest = self.latest_version()
                    conflict = False
                    for v in range(base + 1, new_latest + 1):
                        for a in self._read_actions(v):
                            rm = a.get("remove")
                            if rm is not None and rm["path"] in before_paths:
                                conflict = True
                            md = a.get("metaData")
                            if md is not None and (
                                # every write carries metaData; only a
                                # CHANGE to schema/partitioning conflicts
                                md.get("schemaString") != snap.schema_json
                                or tuple(md.get("partitionColumns") or ())
                                != snap.partition_by
                            ):
                                conflict = True
                    if conflict:
                        break  # restage from the new snapshot
                    base = new_latest  # append-only winners: rebase

    def vacuum(self, retain_versions: int = 2) -> list[str]:
        """Delete data files referenced by NO snapshot newer than
        (latest - retain_versions): removed-and-aged-out files plus
        orphans from crashed writers. Time travel keeps working for the
        retained window; older versions become unreadable (same contract
        as Delta VACUUM)."""
        latest = self.latest_version()
        if latest is None:
            return []
        live: set[str] = set()
        for v in range(max(0, latest - retain_versions), latest + 1):
            live |= set(self.snapshot(v).files)
        # change-data files follow the same retention window: feeds for
        # versions still readable stay, older ones age out with them
        cdf_live: set[str] = set()
        for v in range(max(0, latest - retain_versions), latest + 1):
            for action in self._read_actions(v):
                if "cdc" in action:
                    # keep the whole batch directory the cdc file lives in
                    cdf_live.add(action["cdc"]["path"].rsplit("/", 1)[0])
        deleted = []
        for root, _dirs, names in os.walk(self.path, topdown=False):
            if LOG_DIR in root.split(os.sep):
                continue
            rel_root = os.path.relpath(root, self.path).replace(os.sep, "/")
            if rel_root.startswith(CDF_DIR):
                keep = any(rel_root.startswith(p) for p in cdf_live)
                if not keep and rel_root != CDF_DIR:
                    shutil.rmtree(root, ignore_errors=True)
                    deleted.append(rel_root)
                continue
            for name in names:
                full = os.path.join(root, name)
                rel = os.path.relpath(full, self.path).replace(os.sep, "/")
                if rel not in live and not name.startswith(("_", ".")):
                    os.unlink(full)
                    deleted.append(rel)
            if root != self.path and not os.listdir(root):
                os.rmdir(root)
        return sorted(deleted)

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT (Delta's CHECK constraints, stored
        as ``delta.constraints.<name>`` in metaData.configuration): the
        EXISTING data is scanned first and must satisfy ``expr`` (SQL
        CHECK semantics — NULL passes), then the constraint commits as a
        metadata change; every subsequent write/merge/update batch is
        validated in one aggregate pass before anything publishes."""
        key = f"delta.constraints.{name}"
        while True:
            latest = self.latest_version()
            snap = self.snapshot(latest)
            if key in snap.configuration:
                raise ValueError(f"constraint {name!r} already exists")
            _check_constraints(self.read(spark, version=latest), {name: expr})
            config = {**snap.configuration, key: expr}
            actions = [
                _meta_action(snap, snap.schema, snap.partition_by, config)
            ]
            try:
                return self._commit(latest, actions, "addConstraint")
            except ConcurrentModification:
                continue

    def drop_constraint(self, name: str) -> int:
        """ALTER TABLE DROP CONSTRAINT."""
        key = f"delta.constraints.{name}"
        while True:
            latest = self.latest_version()
            snap = self.snapshot(latest)
            if key not in snap.configuration:
                raise ValueError(f"no constraint {name!r}")
            config = {k: v for k, v in snap.configuration.items() if k != key}
            actions = [
                _meta_action(snap, snap.schema, snap.partition_by, config)
            ]
            try:
                return self._commit(latest, actions, "dropConstraint")
            except ConcurrentModification:
                continue

    def restore(
        self, version: int | None = None, asof_timestamp: float | None = None
    ) -> int:
        """Delta's RESTORE TABLE ... [VERSION|TIMESTAMP] AS OF: commit a
        NEW version whose live file set and schema equal the target
        snapshot's. Nothing is deleted and history is preserved — the
        restore is itself a commit, so time travel across it (including
        back to the pre-restore state) keeps working, and a concurrent
        writer either lands before the restore (and is rolled back by
        it) or after (and wins); the CAS loop guarantees one total
        order. Data files the target still references carry over by
        reference — zero IO. Returns the committed version."""
        if asof_timestamp is not None:
            version = self.version_at(asof_timestamp)
        if version is None:
            raise ValueError("restore needs version or asof_timestamp")
        target = self.snapshot(version)
        while True:
            latest = self.latest_version()
            cur = self.snapshot(latest)
            actions: list[dict[str, Any]] = []
            if (
                target.schema_json != cur.schema_json
                or target.partition_by != cur.partition_by
            ):
                actions.append(
                    _meta_action(cur, target.schema, target.partition_by)
                )
            actions += [
                {"add": {**a, "dataChange": True}}
                for p, a in target.files.items()
                if p not in cur.files
            ]
            actions += [
                _remove_action(p) for p in cur.files if p not in target.files
            ]
            try:
                return self._commit(latest, actions, "restore")
            except ConcurrentModification:
                continue

    def shallow_clone(self, target_path: str, version: int | None = None) -> "TxTable":
        """Delta SHALLOW CLONE: create a new table at ``target_path``
        whose first commit references this table's data files at
        ``version`` (default latest) by ABSOLUTE path — metadata only,
        no data copied, O(#files) regardless of table size. The clone
        gets its own table id and an independent log: writes, DELETE/
        UPDATE, compaction, and vacuum on the clone never touch source
        files (vacuum walks only the clone root; copy-on-write rewrites
        replace references with clone-local files). Caveat shared with
        Delta: VACUUM on the SOURCE can age out files the clone still
        references."""
        snap = self.snapshot(version)
        clone = TxTable(target_path)
        if clone.exists():
            raise ValueError(f"{target_path}: already a transaction-logged table")
        os.makedirs(clone.log_dir, exist_ok=True)
        src_root = os.path.abspath(self.path)
        actions: list[dict[str, Any]] = [{"protocol": dict(PROTOCOL)}]
        # fresh id/createdTime (snap=None) — a clone is a NEW table over
        # shared data files, not a copy of the source's identity
        actions.append(_meta_action(None, snap.schema, snap.partition_by))
        actions += [
            {"add": {**a, "path": os.path.join(src_root, a["path"]), "dataChange": True}}
            for a in snap.files.values()
        ]
        clone._commit(None, actions, "clone")
        return clone


    # ---------------------------------------------------- change data feed

    def _stage_changes(self, changes: DataFrame) -> list[tuple[str, int]]:
        """Write a change batch (rows + ``_change_type``) under
        ``_change_data/<uuid>/`` — invisible to table reads (readers
        only trust the log's add actions) and published by the SAME
        commit that publishes the data files, so the feed is exactly as
        atomic as the table. Returns one (rel path, size) per data file,
        for the spec's per-file ``cdc`` actions."""
        rel = f"{CDF_DIR}/{uuid.uuid4().hex}"
        root = os.path.join(self.path, rel)
        changes.write.format("parquet").mode("overwrite").save(root)
        out = []
        for name in sorted(os.listdir(root)):
            if name.startswith(("_", ".")):
                continue
            full = os.path.join(root, name)
            out.append((f"{rel}/{name}", os.path.getsize(full)))
        return out

    def table_changes(
        self,
        spark: SparkSession,
        from_version: int = 0,
        to_version: int | None = None,
    ) -> DataFrame:
        """Delta-style CDF read: every change row recorded in
        [from_version, to_version] with ``_change_type``
        (insert / update_preimage / update_postimage / delete) and
        ``_commit_version`` columns. Commits made without ``cdf=True``
        contribute nothing (their version is simply absent) — the
        caller decides whether a gap is acceptable, same contract as
        enabling Delta CDF mid-history."""
        latest = self.latest_version()
        if latest is None:
            raise NoSuchVersion(f"{self.path}: no transaction log")
        hi = latest if to_version is None else to_version
        frames = []
        for v in range(from_version, hi + 1):
            paths = [
                os.path.join(self.path, action["cdc"]["path"])
                for action in self._read_actions(v)
                if "cdc" in action
            ]
            if paths:
                df = spark.read.parquet(*paths)
                frames.append(df.withColumn("_commit_version", F.lit(v)))
        if not frames:
            raise NoSuchVersion(
                f"{self.path}: no change data recorded in versions "
                f"[{from_version}, {hi}] — write with cdf=True"
            )
        out = frames[0]
        for df in frames[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        return out


def _pa_checkpoint_schema():
    import pyarrow as pa

    str_map = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string()), ("options", str_map)])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", str_map),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field("txn", pa.struct([("appId", pa.string()), ("version", pa.int64())])),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", str_map),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        ("stats", pa.string()),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )


def _write_checkpoint_parquet(path: str, rows: list[dict[str, Any]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows, schema=_pa_checkpoint_schema()), path)


def _read_checkpoint(path: str) -> list[dict[str, Any]]:
    """Parquet checkpoint rows back to action dicts. pyarrow surfaces map
    columns as lists of (k, v) tuples; convert the spec's three map fields
    back to plain dicts so replay sees the same shapes as commit JSON."""
    import pyarrow.parquet as pq

    out: list[dict[str, Any]] = []
    for row in pq.read_table(path).to_pylist():
        action: dict[str, Any] = {}
        for kind, body in row.items():
            if body is None:
                continue
            body = dict(body)
            for mk in ("partitionValues", "configuration"):
                if isinstance(body.get(mk), list):
                    body[mk] = dict(body[mk])
            fmt = body.get("format")
            if isinstance(fmt, dict) and isinstance(fmt.get("options"), list):
                body["format"] = {**fmt, "options": dict(fmt["options"])}
            action[kind] = body
        out.append(action)
    return out


def _merge_schemas(old: StructType, new: StructType) -> StructType:
    """Union of fields, old order first — mergeSchema append semantics.
    Type conflicts on a shared column are rejected (Delta does the
    same for non-upcastable changes)."""
    by_name = {f.name: f for f in old.fields}
    fields = list(old.fields)
    for f in new.fields:
        prev = by_name.get(f.name)
        if prev is None:
            fields.append(f)
        elif prev.dataType.simpleString() != f.dataType.simpleString():
            raise ValueError(
                f"column {f.name}: incompatible schema change "
                f"{prev.dataType.simpleString()} -> {f.dataType.simpleString()}"
            )
    return StructType(fields)


def maintain_agg_view(
    spark: SparkSession,
    source: TxTable,
    view: TxTable,
    group_by: tuple[str, ...],
    aggs: dict[str, tuple[str, str]],
    state_app_id: str = "agg_view",
) -> dict[str, int]:
    """Incremental maintenance of a grouped ADDITIVE-aggregate view
    (SUM / COUNT) over one transaction-logged append source — the
    delta-aggregation IVM rule, dual of :func:`maintain_join_view`:

        V_new[g]  =  V_old[g]  ⊕  agg(Δ)[g]

    ``aggs`` maps output column → ("sum"|"count", input column).
    Additive aggregates merge by addition, so a refresh reads ONLY the
    source's change feed since the last folded version, aggregates the
    delta (shuffle ∝ |Δ|, never |source|), joins the touched groups of
    the old view, and publishes the merged rows through
    :meth:`TxTable.upsert_by_key` — atomically WITH the folded-version
    txn marker, so maintenance is idempotent and crash-safe. AVG =
    maintain sum + count, divide at read; MIN/MAX are NOT additive
    (deletes would need full regroup) and are deliberately unsupported.

    Sources must append with ``cdf=True``: commits without a change
    feed are invisible to the delta read and would be silently skipped
    (same contract as ``maintain_join_view`` / Delta CDF mid-history).
    A concurrent append landing mid-refresh stays unfolded (the marker
    pins the version read at entry) and folds on the next refresh; a
    concurrent writer on the VIEW raises ConcurrentModification —
    re-run the refresh.
    """
    for out, (kind, _col) in aggs.items():
        if kind not in ("sum", "count"):
            raise ValueError(f"{out}: only additive aggregates (sum/count), got {kind!r}")
    sv = source.latest_version()
    sv = -1 if sv is None else sv
    done = view.snapshot().txns.get(f"{state_app_id}:src", -1) if view.exists() else -1
    if sv <= done:
        return {"merged_groups": 0, "source_version": sv}
    try:
        delta = source.table_changes(spark, from_version=done + 1, to_version=sv)
        delta = delta.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
    except NoSuchVersion:
        delta = None

    keys = list(group_by)
    if delta is not None:
        gexprs = [
            (F.sum(col) if kind == "sum" else F.count(col)).alias(out)
            for out, (kind, col) in aggs.items()
        ]
        d = delta.groupBy(*keys).agg(*gexprs)
        if view.exists():
            old = view.read(spark).select(
                *keys, *[F.col(out).alias(f"_old_{out}") for out in aggs]
            )
            d = d.join(old, keys, "left")
            for out in aggs:
                d = d.withColumn(
                    out, F.col(out) + F.coalesce(F.col(f"_old_{out}"), F.lit(0))
                ).drop(f"_old_{out}")
        d = d.persist()
        try:
            n = d.count()
            if n:
                view.upsert_by_key(
                    spark, d, key_cols=tuple(keys), txn=(f"{state_app_id}:src", sv)
                )
                return {"merged_groups": n, "source_version": sv}
        finally:
            d.unpersist()
    # empty delta (or CDF-less range): advance the marker with a
    # data-less commit so the no-op isn't re-examined every refresh
    empty = (
        view.read(spark).limit(0)
        if view.exists()
        else spark.createDataFrame([], "dummy int")
    )
    if view.exists():
        view.write(empty, mode="append", txn=(f"{state_app_id}:src", sv))
    return {"merged_groups": 0, "source_version": sv}


def maintain_join_view(
    spark: SparkSession,
    left: TxTable,
    right: TxTable,
    view: TxTable,
    on: tuple[str, ...],
    state_app_id: str = "join_view",
) -> dict[str, int]:
    """Incremental maintenance of a materialized inner-join view over
    two transaction-logged tables — the delta-join rule every IVM
    engine implements, composed from this log's own primitives:

        ΔV  =  ΔL ⋈ R_new  ∪  L_old ⋈ ΔR

    (ΔL joins the NEW right so ΔL×ΔR pairs appear exactly once; the
    old left comes from a version-pinned time-travel read, so no
    before-image bookkeeping is needed.) Deltas come from each source's
    change data feed (insert rows only — append sources); the versions
    already folded into the view are tracked as txn markers ON THE VIEW
    (appId ``state_app_id:left|right``), so maintenance is idempotent
    and crash-safe for the same reason the streaming rollup is: the
    delta rows and the high-water marks publish in one atomic commit.

    Scale shape: each refresh joins only the delta against the other
    side (shuffle ∝ |Δ| + matched slice, never |L|+|R|), exactly the
    incremental cost a full recompute forfeits. Returns the number of
    delta rows appended and the versions folded.
    """
    # A source with no transaction log yet is an empty table at
    # version -1 (ADVICE r3: latest_version() returns None there, and
    # None>int raised TypeError). Folding against an empty side is
    # sound: ΔL ⋈ ∅ adds nothing now, and when the side first commits,
    # its whole content arrives as ΔR and joins L_old — which by then
    # contains every previously-folded left row.
    lv = left.latest_version()
    rv = right.latest_version()
    lv = -1 if lv is None else lv
    rv = -1 if rv is None else rv
    state = view.snapshot().txns if view.exists() else {}
    l_done = state.get(f"{state_app_id}:left", -1)
    r_done = state.get(f"{state_app_id}:right", -1)
    if lv == l_done and rv == r_done:
        return {"appended": 0, "left_version": lv, "right_version": rv}

    cols = list(on)
    parts = []
    if lv > l_done and rv >= 0:
        dl = left.table_changes(spark, from_version=l_done + 1, to_version=lv)
        dl = dl.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
        parts.append(dl.join(right.read(spark, version=rv), cols))
    if rv > r_done:
        dr = right.table_changes(spark, from_version=r_done + 1, to_version=rv)
        dr = dr.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_commit_version"
        )
        if l_done >= 0:
            l_old = left.read(spark, version=l_done)
            parts.append(l_old.join(dr, cols))
        # else: left had no folded state, ΔL ⋈ R_new above covers it all

    if not parts:
        delta = None
    else:
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p, allowMissingColumns=True)
    n = delta.count() if delta is not None else 0
    if delta is None or n == 0:
        # still advance the folded-version markers atomically via an
        # empty-but-committed marker write (a data-less commit)
        empty = view.read(spark).limit(0) if view.exists() else None
        if empty is not None:
            view.write(
                empty,
                mode="append",
                txn=[(f"{state_app_id}:left", lv), (f"{state_app_id}:right", rv)],
            )
        return {"appended": 0, "left_version": lv, "right_version": rv}

    # BOTH high-water marks must land in the SAME commit as the delta
    # rows — marking them separately would leave a crash window where a
    # re-run sees one side folded and re-joins the other side's delta
    # against a left that already contains ΔL (double count).
    view.write(
        delta,
        mode="append",
        txn=[(f"{state_app_id}:left", lv), (f"{state_app_id}:right", rv)],
    )
    return {"appended": n, "left_version": lv, "right_version": rv}


def maintain_dedup_view(
    spark: SparkSession,
    source: TxTable,
    view: TxTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_app_id: str = "dedup_view",
) -> dict[str, int]:
    """Incremental exact-dedup registry over an append-only document
    source — the continuous-curation dual of batch ``q_dedup_exact``:

        V[fp] = (MIN(keep_id) over all appends, Σ copies)

    Each refresh reads ONLY the source's CDF inserts since the last
    folded version, fingerprints the delta (md5 of the normalized
    text — the same key as the batch operator), aggregates it
    (shuffle ∝ |Δ|, never |source|), merges the touched fingerprints of
    the old registry (MIN is associative, copies is additive — both
    fold correctly for an APPEND-ONLY source; deletes would need a full
    regroup and are out of contract, as in maintain_agg_view), and
    publishes through :meth:`TxTable.upsert_by_key` atomically WITH the
    folded-version txn marker — idempotent under crash/replay.

    At 100 TB this is the shape dedup actually runs in production:
    the full-corpus groupBy happens once, and every new crawl batch
    afterwards costs |batch| — new documents whose fingerprint already
    exists in the registry are the duplicates to drop before training.
    """
    sv = source.latest_version()
    sv = -1 if sv is None else sv
    done = view.snapshot().txns.get(f"{state_app_id}:src", -1) if view.exists() else -1
    if sv <= done:
        return {"merged_fingerprints": 0, "source_version": sv}
    try:
        delta = source.table_changes(spark, from_version=done + 1, to_version=sv)
        delta = delta.filter(F.col("_change_type") == "insert")
    except NoSuchVersion:
        delta = None

    if delta is not None:
        norm = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
                r"\s+",
                " ",
            )
        )
        d = (
            delta.filter(F.col(text_col).isNotNull())
            .select(F.md5(norm).alias("fingerprint"), F.col(id_col))
            .groupBy("fingerprint")
            .agg(
                F.min(id_col).alias("keep_doc_id"),
                F.count("*").alias("copies"),
            )
        )
        if view.exists():
            old = view.read(spark).select(
                "fingerprint",
                F.col("keep_doc_id").alias("_old_keep"),
                F.col("copies").alias("_old_copies"),
            )
            d = (
                d.join(old, "fingerprint", "left")
                .withColumn(
                    "keep_doc_id",
                    F.least(
                        F.col("keep_doc_id"),
                        F.coalesce(F.col("_old_keep"), F.col("keep_doc_id")),
                    ),
                )
                .withColumn(
                    "copies",
                    F.col("copies") + F.coalesce(F.col("_old_copies"), F.lit(0)),
                )
                .drop("_old_keep", "_old_copies")
            )
        d = d.persist()
        try:
            n = d.count()
            if n:
                view.upsert_by_key(
                    spark,
                    d,
                    key_cols=("fingerprint",),
                    txn=(f"{state_app_id}:src", sv),
                )
                return {"merged_fingerprints": n, "source_version": sv}
        finally:
            d.unpersist()
    empty = (
        view.read(spark).limit(0)
        if view.exists()
        else spark.createDataFrame([], "fingerprint string, keep_doc_id bigint, copies bigint")
    )
    view.write(empty, mode="append", txn=(f"{state_app_id}:src", sv))
    return {"merged_fingerprints": 0, "source_version": sv}
