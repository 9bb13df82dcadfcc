"""Per-partition checkpoint / resume layout.

The reference has no run-level resume; its warm ``ModelParams`` threading
(freshness_utils.py:875-928, model_config.py:145-156) is the incremental-
state template.  The north rule requires real resumability: verdict +
violation output is laid out one directory per partition, named by lineage
ID, with a manifest of completed partitions; a resumed run prunes finished
partitions **at the read** (hash-bucket filter inside map_batches) so no
finished partition's rows flow through the pipeline again.

Timestamps in manifests follow the reference's epoch-seconds serialization
convention (freshness_utils.py:820-829).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.parquet as pq


def lineage_id(dataset: str, partition_id: str, eval_ts: float) -> str:
    return f"{dataset}/{partition_id}@{int(eval_ts)}"


@dataclass
class RunCheckpoint:
    """Manifest-backed resumable output layout under ``root``:

    root/
      manifest.json                  {partition_id: {lineage_id, finished_at}}
      verdicts/part=<pid>/*.parquet
      violations/part=<pid>/*.parquet
    """

    root: str
    dataset: str
    eval_ts: float

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)
        self._manifest_path = os.path.join(self.root, "manifest.json")
        self._manifest = {}
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)

    # -- queries ------------------------------------------------------------

    @property
    def completed(self) -> set[str]:
        return set(self._manifest)

    def is_done(self, partition_id: str) -> bool:
        return partition_id in self._manifest

    # -- writes -------------------------------------------------------------

    def _part_dir(self, kind: str, partition_id: str) -> str:
        return os.path.join(self.root, kind, f"part={partition_id}")

    def write_partition(
        self,
        partition_id: str,
        verdicts: pa.Table,
        violations: Optional[pa.Table] = None,
        stats: Optional[pa.Table] = None,
    ) -> None:
        """Atomic per-partition write (temp dir + rename), then manifest
        update — the unit of resume.

        ``stats`` carries the partition's per-column stats INCLUDING the
        mergeable sketch bytes (north rule: checkpoints carry lineage IDs
        and stats metrics): a later run over grown data can merge the
        saved sketches with fresh partials instead of re-decoding
        finished partitions."""
        for kind, tbl in (("verdicts", verdicts), ("violations", violations),
                          ("stats", stats)):
            if tbl is None:
                continue
            final = self._part_dir(kind, partition_id)
            tmp = final + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            os.makedirs(tmp)
            pq.write_table(tbl, os.path.join(tmp, "data.parquet"))
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
        self._manifest[partition_id] = {
            "lineage_id": lineage_id(self.dataset, partition_id, self.eval_ts),
            "finished_at": int(time.time()),
        }
        tmp_m = self._manifest_path + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump(self._manifest, f, indent=0, sort_keys=True)
        os.replace(tmp_m, self._manifest_path)

    # -- reads --------------------------------------------------------------

    def read_all(self, kind: str) -> Optional[pa.Table]:
        base = os.path.join(self.root, kind)
        if not os.path.isdir(base):
            return None
        tables = []
        for d in sorted(os.listdir(base)):
            p = os.path.join(base, d, "data.parquet")
            if os.path.exists(p):
                tables.append(pq.read_table(p))
        return pa.concat_tables(tables) if tables else None


def pending_partition_filter(completed: set[str]):
    """A vectorized batch filter dropping rows of finished partitions —
    applied right after the read so resumed runs skip done work before any
    compute (requires a ``partition_id`` column)."""
    import numpy as np
    import pyarrow.compute as pc

    done = pa.array(sorted(completed), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        if len(completed) == 0:
            return batch
        mask = pc.invert(pc.is_in(batch["partition_id"], value_set=done))
        return batch.filter(mask)

    return f
