"""Periodic partial-table snapshot and resume.

The reference has no checkpointing (SURVEY.md §5); its dormant spill files
were "restartable artifacts in spirit" only.  Here the consolidated count
table *is* the engine's entire state, so a checkpoint is cheap and exact:

  * snapshot: the consolidated table in the standard record format
    (records.py §2.2) plus a JSON manifest recording the configuration
    fingerprint and how many reads have been fully absorbed;
  * resume: load the table back into the accumulator and skip the absorbed
    read prefix during ingest (ingest order is deterministic: sorted files,
    sequential reads).

Counts are exact on resume because a chunk is only marked absorbed after
the device step that includes it has been enqueued and the snapshot is
taken from a consolidated table that contains it.
"""

from __future__ import annotations

import json
import os

import numpy as np

from kmer_counter_tpu import records

MANIFEST = "checkpoint.json"
TABLE = "table.bin"


def config_fingerprint(opts) -> dict:
    return {
        "kmer_length": opts.kmer_length,
        "canonical": opts.canonical,
        "input_dir": os.path.abspath(opts.input_dir) if opts.input_dir else None,
    }


def save(
    ckpt_dir: str,
    opts,
    lanes: np.ndarray,
    counts: np.ndarray,
    reads_absorbed: int,
) -> None:
    """Atomically write table + manifest (write tmp, then rename)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    words = records.lanes_to_words(np.asarray(lanes))
    keep = np.asarray(counts) > 0
    data = records.serialize_table(words[keep], np.asarray(counts)[keep])
    tmp_table = os.path.join(ckpt_dir, TABLE + ".tmp")
    with open(tmp_table, "wb") as fh:
        fh.write(data)
    os.replace(tmp_table, os.path.join(ckpt_dir, TABLE))
    manifest = {
        "config": config_fingerprint(opts),
        "reads_absorbed": int(reads_absorbed),
        "records": int(keep.sum()),
    }
    tmp_manifest = os.path.join(ckpt_dir, MANIFEST + ".tmp")
    with open(tmp_manifest, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp_manifest, os.path.join(ckpt_dir, MANIFEST))


def load(ckpt_dir: str, opts):
    """Returns (lanes, counts, reads_absorbed) or None if absent/mismatched.

    A manifest whose config fingerprint differs from the current run is
    ignored (counting k=31 cannot resume a k=15 snapshot).
    """
    manifest_path = os.path.join(ckpt_dir, MANIFEST)
    table_path = os.path.join(ckpt_dir, TABLE)
    if not (os.path.exists(manifest_path) and os.path.exists(table_path)):
        return None
    with open(manifest_path) as fh:
        manifest = json.load(fh)
    if manifest.get("config") != config_fingerprint(opts):
        return None
    with open(table_path, "rb") as fh:
        words, counts = records.parse_records(fh.read(), opts.kmer_length)
    lanes = records.words_to_lanes(words)
    return lanes, counts, int(manifest["reads_absorbed"])
