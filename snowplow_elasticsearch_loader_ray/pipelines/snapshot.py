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
    leftovers = [p for sub in ("segments", "docmap", "manifests")
                 for p in glob.glob(os.path.join(snap_dir, sub, "*"))]
    if leftovers:
        # a prior snapshot of a DIFFERENT index leaves shards that
        # _copy_tree would not overwrite; they'd pass their own hash
        # check and restore alongside the new index's — refuse, exactly
        # like restore_index guards its target
        raise ValueError(
            f"refusing to snapshot into non-empty target {snap_dir!r}: "
            f"{len(leftovers)} leftover file(s) (e.g. {leftovers[0]!r})")
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


# --------------------------------------------------------------------------
# incremental snapshot repository (the ES snapshot-repository design:
# content-addressed blobs shared across snapshots, so snapshotting an
# index chain after a refresh copies ONLY the new generation's files)
# --------------------------------------------------------------------------
#
# Layout:
#   <repo>/blobs/<sha256>            content-addressed file store
#   <repo>/snapshots/<name>.json     committed snapshot manifests
#
# A snapshot manifest records (relpath, blob, bytes) for every captured
# file plus the per-index segment verifications that passed before
# upload. Blob writes are tmp+rename (idempotent under concurrent
# snapshots); a snapshot is visible only once its manifest commits, so
# a crashed snapshot leaves at worst orphan blobs, reclaimable by
# ``gc_repository``. On a real deployment ``blobs/`` is an object-store
# prefix and the copy is an upload — the incremental logic (hash,
# check-exists, upload-if-missing) is byte-for-byte the same.

#: surfaces captured per index directory (runs/ intermediates excluded,
#: same rationale as snapshot_index)
_INDEX_SUBS = ("segments", "docmap", "manifests")


def _index_files(index_dir: str, prefix: str = "") -> list[tuple[str, str]]:
    """(relpath-under-snapshot, abspath) for one index's durable files."""
    out = []
    for sub in _INDEX_SUBS:
        d = os.path.join(index_dir, sub)
        for f in sorted(glob.glob(os.path.join(d, "**", "*"), recursive=True)):
            if os.path.isfile(f):
                out.append((os.path.join(prefix, sub,
                                         os.path.relpath(f, d)), f))
    return out


def _store_blobs(repo_dir: str, files: list[tuple[str, str]]) -> dict:
    """Upload-if-missing every file into ``<repo>/blobs``; → stats +
    the manifest file list."""
    blob_dir = os.path.join(repo_dir, "blobs")
    os.makedirs(blob_dir, exist_ok=True)
    entries, copied, reused = [], 0, 0
    for rel, src in files:
        digest = mf.file_sha256(src)
        blob = os.path.join(blob_dir, digest)
        size = os.path.getsize(src)
        if os.path.exists(blob):
            reused += size
        else:
            shutil.copy2(src, blob + ".tmp")
            os.replace(blob + ".tmp", blob)
            # stamp UPLOAD time: copy2 preserved the source mtime, and
            # gc_repository's in-flight grace window keys on blob mtime
            # — a day-old segment's blob must not look day-old to GC
            # before its snapshot manifest commits
            os.utime(blob, None)
            copied += size
        entries.append({"path": rel, "blob": digest, "bytes": size})
    return {"files": entries, "bytes_copied": copied, "bytes_reused": reused}


def snapshot_incremental(index_dir: str, repo_dir: str, name: str) -> dict:
    """Snapshot a committed index into a blob repository. Files whose
    content already exists in the repo (from ANY earlier snapshot) are
    reused, not copied — the second snapshot of an unchanged index
    costs hashing only."""
    man_dir = os.path.join(index_dir, "manifests")
    if not mf.is_committed(man_dir, "index"):
        raise ValueError("refusing to snapshot: index manifest not committed")
    if mf.is_committed(os.path.join(repo_dir, "snapshots"), name):
        raise ValueError(f"snapshot {name!r} already exists in {repo_dir!r}")
    verified = _verify_segments(index_dir)
    st = _store_blobs(repo_dir, _index_files(index_dir))
    payload = {"stage": "snapshot", "kind": "index",
               "source": os.path.abspath(index_dir),
               "segments_verified": verified, **st}
    return mf.commit(os.path.join(repo_dir, "snapshots"), name, payload)


def snapshot_live_incremental(live_root: str, repo_dir: str,
                              name: str) -> dict:
    """Snapshot a LiveIndex generation chain (every live generation's
    index files + the chain manifests + delete sidecars). This is where
    incrementality pays: between two snapshots only the generations
    created by refreshes/compactions since the last one ship new blobs
    — the base generation (the bulk of a 10^12-doc deployment) is
    hash-checked and reused."""
    from .live import LiveIndex

    live = LiveIndex(live_root)
    gens = live.generations()
    if not gens:
        raise ValueError("live index has no generations to snapshot")
    if mf.is_committed(os.path.join(repo_dir, "snapshots"), name):
        raise ValueError(f"snapshot {name!r} already exists in {repo_dir!r}")
    files: list[tuple[str, str]] = []
    verified = 0
    for g in gens:
        verified += _verify_segments(g)
        files.extend(_index_files(g, prefix=os.path.basename(g)))
        # stored source (_delta_docs) is load-bearing chain state:
        # update_by_query and the compaction stored-source merge read
        # it, so a restore without it silently loses text
        dd = os.path.join(g, "_delta_docs")
        for f in sorted(glob.glob(os.path.join(dd, "*.parquet"))):
            files.append((os.path.join(os.path.basename(g), "_delta_docs",
                                       os.path.basename(f)), f))
    for sub in ("manifests", "deletes"):
        d = os.path.join(live_root, sub)
        for f in sorted(glob.glob(os.path.join(d, "*"))):
            if os.path.isfile(f):
                files.append((os.path.join(sub, os.path.relpath(f, d)), f))
    st = _store_blobs(repo_dir, files)
    payload = {"stage": "snapshot", "kind": "live",
               "source": os.path.abspath(live_root),
               "generations": [os.path.basename(g) for g in gens],
               "segments_verified": verified, **st}
    return mf.commit(os.path.join(repo_dir, "snapshots"), name, payload)


def restore_incremental(repo_dir: str, name: str, target_dir: str) -> dict:
    """Materialize a repository snapshot into an empty ``target_dir``
    and re-verify every restored index's segment hashes (single index
    or live chain, per the snapshot's recorded kind)."""
    snaps_dir = os.path.join(repo_dir, "snapshots")
    if not mf.is_committed(snaps_dir, name):
        raise ValueError(f"no snapshot {name!r} in {repo_dir!r}")
    snap = mf.load(snaps_dir, name)   # one read, not a repo-wide scan
    if os.path.isdir(target_dir) and os.listdir(target_dir):
        raise ValueError(
            f"refusing to restore into non-empty target {target_dir!r} — "
            "leftover files would be served next to the restored ones")
    blob_dir = os.path.join(repo_dir, "blobs")
    total = 0
    for e in snap["files"]:
        out = os.path.join(target_dir, e["path"])
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy2(os.path.join(blob_dir, e["blob"]), out + ".tmp")
        # the blob NAME is its content address — re-hash the copy so a
        # rotted/truncated blob fails the restore loudly for EVERY file
        # class (docmap/manifests/sidecars), not only hash-manifested
        # segments
        got = mf.file_sha256(out + ".tmp")
        if got != e["blob"]:
            raise ValueError(
                f"blob hash mismatch for {e['path']!r}: stored "
                f"{e['blob'][:12]}…, content {got[:12]}… — repository "
                f"blob is corrupt")
        os.replace(out + ".tmp", out)
        total += e["bytes"]
    if snap["kind"] == "live":
        verified = sum(_verify_segments(os.path.join(target_dir, g))
                       for g in snap["generations"])
    else:
        verified = _verify_segments(target_dir)
    return {"stage": "restore", "kind": snap["kind"],
            "segments": verified, "bytes": total}


def delete_snapshot(repo_dir: str, name: str) -> None:
    """Drop a snapshot manifest; its blobs stay until ``gc_repository``
    (other snapshots may reference them — the ES delete semantics)."""
    p = mf.manifest_path(os.path.join(repo_dir, "snapshots"), name)
    if not os.path.exists(p):
        raise ValueError(f"no snapshot {name!r} in {repo_dir!r}")
    os.remove(p)


def slm_retain(repo_dir: str, keep_last: int,
               grace_s: float = 15 * 60) -> dict:
    """ES SLM retention (`slm.retention` with ``max_count``): keep the
    newest ``keep_last`` committed snapshots — ordered by
    (committed_at, name), name breaking the 1-second timestamp ties
    deterministically — delete the rest, then gc unreferenced blobs
    (content-addressing means a blob shared with a kept snapshot
    survives). Returns kept/deleted names + the gc counters."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (retain something)")
    snaps = mf.load_all(os.path.join(repo_dir, "snapshots"))
    order = sorted(snaps, key=lambda n: (snaps[n].get("committed_at", ""),
                                         n))
    doomed = order[:-keep_last] if len(order) > keep_last else []
    for name in doomed:
        delete_snapshot(repo_dir, name)
    gc = gc_repository(repo_dir, grace_s=grace_s)
    return {"kept": order[len(doomed):], "deleted": doomed, **gc}


def gc_repository(repo_dir: str, grace_s: float = 15 * 60) -> dict:
    """Remove blobs referenced by no committed snapshot; → counts.

    ``grace_s``: blobs younger than this are kept even when
    unreferenced. A snapshot in flight has uploaded its blobs but not
    yet committed its manifest — a gc racing it would delete blobs the
    about-to-commit snapshot references, leaving a committed snapshot
    that fails restore. The grace window (ES repository gc uses the
    same idea) makes unreferenced-AND-old the reclaim condition; pass
    ``grace_s=0`` only when no snapshot can be concurrently running."""
    import time as _time

    live: set[str] = set()
    for snap in mf.load_all(os.path.join(repo_dir, "snapshots")).values():
        live.update(e["blob"] for e in snap.get("files", []))
    now = _time.time()
    removed, kept, freed = 0, 0, 0
    for f in glob.glob(os.path.join(repo_dir, "blobs", "*")):
        if (os.path.basename(f) in live or f.endswith(".tmp")
                or now - os.path.getmtime(f) < grace_s):
            kept += 1
        else:
            freed += os.path.getsize(f)
            os.remove(f)
            removed += 1
    return {"blobs_removed": removed, "blobs_kept": kept,
            "bytes_freed": freed}
