"""fvecs/ivecs as a first-class Spark data source (Spark 4 Python
DataSource API): ``spark.read.format("fvecs").load(path)``.

Upgrade over the binaryFile+mapInPandas connector in ``fvecs.py``:

- **O(1) partition planning.** fvecs records are uniform-width
  (dim from the first header word), so per-file row counts — and the
  global id offsets that preserve the reference's "node id = file
  position" contract (reference utilities.py:84-86) — come from file
  SIZE + one 4-byte header read, not a decode pass over every byte.
- **One InputPartition per shard file**, decoded executor-side; the
  driver never touches vector data (the reference decoded everything
  in the driver, main.py:31 — its documented scale failure).

Register once per session:  ``spark.dataSource.register(FvecsDataSource)``.
Options: ``format`` = fvecs (default) | ivecs.
"""

from __future__ import annotations

import glob
import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str, base_id: int):
        self.path = path
        self.base_id = base_id


def _list_shards(path: str) -> list[str]:
    if os.path.isdir(path):
        files = [p for p in glob.glob(os.path.join(path, "*")) if os.path.isfile(p)]
    else:
        files = glob.glob(path)
    # _SUCCESS and in-flight _staging-* files are metadata, not shards
    # (parquet's same convention): invisible to readers and fair game
    # for the committer to ignore.
    return sorted(f for f in files if not os.path.basename(f).startswith(("_", ".")))


def _shard_rows(path: str) -> int:
    size = os.path.getsize(path)
    if size < 4:
        return 0
    with open(path, "rb") as fh:
        (dim,) = struct.unpack("<i", fh.read(4))
    if dim <= 0:
        return 0
    return size // (4 + 4 * dim)


class FvecsDataSource(DataSource):
    """``format("fvecs")``: (vec_id bigint, embedding array<float>) or,
    with ``option("format", "ivecs")``, (vec_id bigint, components
    array<int>)."""

    @classmethod
    def name(cls) -> str:
        return "fvecs"

    def schema(self) -> str:
        if self.options.get("format", "fvecs") == "ivecs":
            return "vec_id bigint, components array<int>"
        return "vec_id bigint, embedding array<float>"

    def reader(self, schema) -> DataSourceReader:
        return _VecsReader(self.options)

    def writer(self, schema, overwrite: bool):
        return _VecsWriter(self.options, overwrite)


class _VecsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fvecs data source requires a load path")
        self.kind = options.get("format", "fvecs")

    def partitions(self):
        parts, acc = [], 0
        for f in _list_shards(self.path):
            parts.append(_ShardPartition(f, acc))
            acc += _shard_rows(f)
        if not parts:
            raise FileNotFoundError(f"no fvecs shards at {self.path}")
        return parts

    def read(self, partition: _ShardPartition):
        import numpy as np

        from pyspark_mrdf_spark.sources.fvecs import _decode

        dtype = np.int32 if self.kind == "ivecs" else np.float32
        with open(partition.path, "rb") as fh:
            content = fh.read()
        for i, vec in enumerate(_decode(content, dtype)):
            yield (partition.base_id + i, vec.tolist())


# --- write path (distributed fvecs/ivecs sink) ----------------------


class _ShardCommit(WriterCommitMessage):
    def __init__(self, staged: str, final: str, rows: int):
        self.staged = staged
        self.final = final
        self.rows = rows


class _VecsWriter(DataSourceWriter):
    """One shard file per input partition (``part-NNNNN.fvecs``),
    packed executor-side — the distributed upgrade of the reference's
    driver-local fvecs writer (S6): vector bytes never visit the
    driver, and N partitions write N shards in parallel (parquet has
    the same no-concurrent-appenders contract). Row order within a
    partition is preserved, so ``read → transform → write`` keeps the
    "id = file position" convention per shard; readers reassign global
    ids by shard offset (see _VecsReader.partitions). ``mode('append')``
    continues the part numbering past the existing shards (see
    __init__), so prior ids never move."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fvecs data source requires a save path")
        self.kind = options.get("format", "fvecs")
        self.overwrite = overwrite
        # Append (r10 verdict stretch #8): ids stay stable because the
        # reader assigns them by shard-name order — new shards continue
        # the part-NNNNN numbering, so every new file sorts AFTER every
        # existing one and prior vectors keep their positions; appended
        # vectors get ids = old_total + in-batch position. The numbering
        # base is decided ONCE driver-side; the commit never touches
        # prior shards. Non-standard shard names make the sort-after
        # guarantee unprovable, so those layouts refuse the append
        # instead of silently renumbering a reader's view.
        self.base_index = 0
        self._reservation = None
        if not overwrite:
            import re

            ext = "ivecs" if self.kind == "ivecs" else "fvecs"
            shards = _list_shards(self.path) if os.path.exists(self.path) else []
            # an existing shard set without a _SUCCESS marker is a TORN
            # prior commit (commit() retracts the marker first and
            # republishes it last) — appending over it would recount
            # and republish _SUCCESS, silently legitimizing a directory
            # that lost rows. Refuse; the operator decides (re-run the
            # overwrite, or inspect).
            if shards and not os.path.exists(os.path.join(self.path, "_SUCCESS")):
                raise ValueError(
                    "fvecs append: target has shards but no _SUCCESS marker "
                    "(torn prior commit or foreign directory) — appending "
                    "would erase the torn-commit evidence; recover with "
                    "mode('overwrite') instead"
                )
            pat = re.compile(r"part-(\d{5})\.(fvecs|ivecs)$")
            idxs = []
            for f in shards:
                m = pat.match(os.path.basename(f))
                if not m:
                    raise NotImplementedError(
                        "fvecs append requires the sink's own part-NNNNN "
                        f"shard layout; found {os.path.basename(f)!r} — "
                        "id stability cannot be guaranteed, use "
                        "mode('overwrite')"
                    )
                if m.group(2) != ext:
                    # a mixed fvecs/ivecs directory would decode one
                    # kind's payload as the other's dtype with no error
                    raise ValueError(
                        f"fvecs append: target holds .{m.group(2)} shards "
                        f"but this write is .{ext} — mixing kinds would "
                        "silently mis-decode on read"
                    )
                idxs.append(int(m.group(1)))
            self.base_index = max(idxs) + 1 if idxs else 0
            if self.base_index >= 99999:
                raise ValueError("fvecs append: part-NNNNN namespace exhausted")
            # Reserve the append EXCLUSIVELY (advisor r11): two
            # appenders constructed before either commits would compute
            # the same base_index and their os.replace renames would
            # silently clobber each other. An O_EXCL marker makes the
            # second reservation fail loudly instead; commit()/abort()
            # release it. A crashed appender leaves the marker behind —
            # deliberately: its staging leftovers need inspection, and
            # the error names the file to remove.
            os.makedirs(self.path, exist_ok=True)
            self._reservation = os.path.join(self.path, "_append-reservation")
            try:
                with open(self._reservation, "x") as fh:
                    fh.write(str(self.base_index))
            except FileExistsError:
                raise ValueError(
                    "fvecs append: another appender holds "
                    f"{self._reservation} (concurrent append, or a crashed "
                    "one — inspect the directory, then delete the marker "
                    "to re-enable appends)"
                ) from None

    def write(self, iterator):
        # Commit protocol (round-10, advisor finding): tasks write to
        # task-attempt-unique STAGING names; the destination's prior
        # shards are untouched until commit(), which deletes them and
        # renames staged files into place only after every task has
        # succeeded. A failed or speculated task therefore never leaves
        # a half-written or clobbered shard behind — the pre-change
        # code deleted the destination driver-side before any task ran,
        # so a failed job emptied it with no way back.
        import numpy as np
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId()
        attempt = tc.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        ext = "ivecs" if self.kind == "ivecs" else "fvecs"
        dtype = np.int32 if self.kind == "ivecs" else np.float32
        shard_no = self.base_index + pid
        if shard_no > 99999:
            # a 6-digit name would lexically sort BEFORE the 5-digit
            # ones and renumber every prior id — fail the task (staged
            # files are swept by abort()) before any commit can happen
            raise ValueError(
                f"fvecs sink: shard number {shard_no} exceeds the "
                "part-NNNNN namespace; compact the directory or reduce "
                "partitions"
            )
        final = os.path.join(self.path, f"part-{shard_no:05d}.{ext}")
        staged = os.path.join(
            self.path, f"_staging-part-{shard_no:05d}-attempt-{attempt}.{ext}"
        )
        rows = 0
        dim = None
        with open(staged, "wb") as fh:
            for row in iterator:
                vec = np.asarray(row[1], dtype=dtype)
                if dim is None:
                    dim = len(vec)
                elif len(vec) != dim:
                    raise ValueError(
                        f"ragged vectors in one shard: {len(vec)} vs {dim}"
                    )
                fh.write(struct.pack("<i", len(vec)))
                fh.write(vec.tobytes())
                rows += 1
        if rows == 0:
            os.remove(staged)
            return _ShardCommit("", "", 0)
        return _ShardCommit(staged, final, rows)

    def commit(self, messages):
        live = [m for m in messages if m is not None and m.staged]
        # All tasks succeeded: now (and only now) clear prior shards,
        # then publish staged files under their final names. rename()
        # is atomic per file, so readers racing the commit see either
        # the old shard set or a mix of old/new complete shards — never
        # a torn file. _SUCCESS is retracted FIRST and republished
        # LAST: a driver crash anywhere inside the swap leaves a
        # directory with no _SUCCESS marker, so a torn commit is
        # detectable by readers instead of the stale marker silently
        # advertising the prior row total over a partial shard set.
        success = os.path.join(self.path, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
        if self.overwrite:
            for f in _list_shards(self.path):
                os.remove(f)
        # append: prior shards untouched — the new part numbers were
        # reserved past the existing range driver-side, so the renames
        # below can never collide with (or shadow) a prior shard
        for m in live:
            os.replace(m.staged, m.final)
        # a retried task's FAILED first attempt never returned a commit
        # message, so its orphan staging file is only findable by name
        self._sweep_staging(keep=set())
        # _SUCCESS carries the committed ROW TOTAL of the whole
        # directory; for append that is prior + new, recounted from the
        # shard headers (O(files) stat+4-byte reads)
        total = sum(_shard_rows(f) for f in _list_shards(self.path))
        with open(success, "w") as fh:
            fh.write(str(total))
        self._release_reservation()

    def abort(self, messages):
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)
        # tasks that raised mid-write produced no message at all: their
        # staging files (invisible to readers) are swept by pattern
        self._sweep_staging(keep=set())
        # an aborted append left no published shards, so the reserved
        # range is safe to hand to the next appender
        self._release_reservation()

    def _release_reservation(self) -> None:
        if self._reservation is not None:
            try:
                os.remove(self._reservation)
            except OSError:
                pass
            self._reservation = None

    def _sweep_staging(self, keep: set[str]) -> None:
        for f in glob.glob(os.path.join(self.path, "_staging-*")):
            if f not in keep and os.path.isfile(f):
                try:
                    os.remove(f)
                except OSError:
                    pass
