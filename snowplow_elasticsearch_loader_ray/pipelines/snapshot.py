"""Index snapshot / restore — the ES ``_snapshot`` API analogue.

A committed index is a content-addressed artifact: every segment
manifest records a ``content_hash`` over its output files
(``state/manifest.py``). Snapshotting copies the durable surfaces
(segments + docmap + manifests) while verifying each segment against
its recorded hash; restore copies back and re-verifies, so silent
corruption on either side fails loudly instead of serving wrong
postings. ``runs/`` intermediates are never snapshotted — they are
lineage-recoverable and typically GC'd (``build.gc_runs``).

On a real deployment the copy targets object storage; the verify-while
-copy shape is the same (stream, hash, compare, upload).
"""

from __future__ import annotations

import glob
import os
import shutil

from ..state import manifest as mf


def _verify_segments(index_dir: str) -> int:
    """Recompute every segment's content hash against its manifest;
    → number of verified segments. Raises on any mismatch."""
    man_dir = os.path.join(index_dir, "manifests")
    n = 0
    for name, m in mf.load_all(man_dir, prefix="segment-shard-").items():
        paths = [os.path.join(index_dir, rel) for rel in m["outputs"]]
        got = mf.content_hash(paths)
        if got != m["content_hash"]:
            raise ValueError(f"{name}: content hash mismatch "
                             f"(recorded {m['content_hash'][:12]}, "
                             f"recomputed {got[:12]}) — index is corrupt")
        n += 1
    return n


def verify_index(index_dir: str) -> dict:
    """The ES ``_verify``-style check: committed + every segment hash
    matches its manifest. → {segments_verified, n_docs}."""
    man_dir = os.path.join(index_dir, "manifests")
    if not mf.is_committed(man_dir, "index"):
        raise ValueError("index manifest not committed")
    n = _verify_segments(index_dir)
    from .build import index_stats

    return {"segments_verified": n, "n_docs": index_stats(index_dir)["n_docs"]}


def _copy_tree(src: str, dst: str, sub: str) -> int:
    """Copy ``src/sub`` → ``dst/sub``; → bytes copied."""
    s, d = os.path.join(src, sub), os.path.join(dst, sub)
    total = 0
    if not os.path.isdir(s):
        return 0
    os.makedirs(d, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(s, "**", "*"), recursive=True)):
        if os.path.isfile(f):
            rel = os.path.relpath(f, s)
            out = os.path.join(d, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            shutil.copy2(f, out)
            total += os.path.getsize(out)
    return total


def snapshot_index(index_dir: str, snap_dir: str) -> dict:
    """Snapshot a COMMITTED index: verify every segment hash, copy
    segments + docmap + manifests, and commit a ``snapshot`` manifest.
    Refuses uncommitted or corrupt indexes."""
    man_dir = os.path.join(index_dir, "manifests")
    if not mf.is_committed(man_dir, "index"):
        raise ValueError("refusing to snapshot: index manifest not committed")
    verified = _verify_segments(index_dir)
    os.makedirs(snap_dir, exist_ok=True)
    total = sum(_copy_tree(index_dir, snap_dir, sub)
                for sub in ("segments", "docmap", "manifests"))
    # re-verify the COPIES before declaring the snapshot good
    _verify_segments(snap_dir)
    payload = {"stage": "snapshot", "source": os.path.abspath(index_dir),
               "segments": verified, "bytes": total}
    mf.commit(os.path.join(snap_dir, "manifests"), "snapshot", payload)
    return payload


def restore_index(snap_dir: str, index_dir: str) -> dict:
    """Restore a snapshot into ``index_dir``, re-verifying every segment
    hash after the copy. The target must be empty of index state: the
    readers glob ``segments/*.parquet`` and ``docmap/*.parquet``, so
    leftover files from an aborted build would be served alongside the
    restored (verified) ones — refuse instead."""
    if not mf.is_committed(os.path.join(snap_dir, "manifests"), "snapshot"):
        raise ValueError("not a committed snapshot")
    if mf.is_committed(os.path.join(index_dir, "manifests"), "index"):
        raise ValueError("refusing to restore over a committed index")
    leftovers = [p for sub in ("segments", "docmap", "manifests", "runs")
                 for p in glob.glob(os.path.join(index_dir, sub, "*"))]
    if leftovers:
        raise ValueError(
            f"refusing to restore into non-empty target {index_dir!r}: "
            f"{len(leftovers)} leftover file(s) (e.g. {leftovers[0]!r}) "
            "would be served next to the restored segments — clear the "
            "directory first")
    total = sum(_copy_tree(snap_dir, index_dir, sub)
                for sub in ("segments", "docmap", "manifests"))
    verified = _verify_segments(index_dir)
    return {"stage": "restore", "segments": verified, "bytes": total}
