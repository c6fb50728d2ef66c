"""Per-partition checkpoint manifests with lineage + metrics.

Ray Data has no built-in job checkpointing (SURVEY §7.5); the reference
has none either (its KVS tables merely survive restarts,
``kvs/Worker.java:160-195``). Resumability here is explicit:

- every build partition writes its outputs to a partition directory,
  then atomically writes ``manifest.json`` (tmp + ``os.replace``) —
  a partition is "done" iff its manifest exists and is valid;
- the manifest carries LINEAGE (exact input file fragments: path,
  row-group range, row count) and METRICS (docs, tokens, bytes,
  wall seconds), so a resumed or audited build can prove which input
  produced which shard;
- a rerun skips done partitions (idempotent outputs, identical bytes —
  asserted by ``tests/test_resume.py``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

# Bump when the checkpoint/docstore schema changes incompatibly so a
# resume never mixes old and new partition outputs.
# v2: docs checkpoint stores the FULL extracted ``body`` (was a 200-char
#     ``body_prefix``) to match the reference's /search contract.
CURRENT_SCHEMA_VERSION = 2


@dataclass
class InputFragment:
    path: str
    row_group_start: int
    row_group_end: int  # exclusive
    num_rows: int


@dataclass
class PartitionManifest:
    partition_id: int
    inputs: list[InputFragment]
    num_docs: int = 0
    num_tokens: int = 0
    input_bytes: int = 0
    wall_seconds: float = 0.0
    finished_at_unix: float = field(default_factory=time.time)
    schema_version: int = CURRENT_SCHEMA_VERSION

    def write(self, part_dir: str) -> str:
        path = os.path.join(part_dir, "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, path)  # atomic: manifest appears only when complete
        return path


def read_manifest(part_dir: str) -> PartitionManifest | None:
    path = os.path.join(part_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            d = json.load(f)
        d["inputs"] = [InputFragment(**i) for i in d["inputs"]]
        return PartitionManifest(**d)
    except (json.JSONDecodeError, TypeError, KeyError):
        return None  # torn/garbage manifest == not done


def partition_is_done(part_dir: str) -> bool:
    m = read_manifest(part_dir)
    return m is not None and m.schema_version == CURRENT_SCHEMA_VERSION


def write_json_atomic(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
    os.replace(tmp, path)
