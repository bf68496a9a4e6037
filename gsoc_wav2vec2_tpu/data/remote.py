"""Remote (object-store) storage support: gs:// tfrecords and checkpoints.

The reference streams its training shards and checkpoints from GCS buckets
(`/root/reference/src/main.py:60-90`, `training_utils.py:38-45`,
`readme.md:86-96`) — every host of the TPU pod reads the same bucket.  The
TPU-native equivalent routes any `scheme://` path through `fsspec` (gcsfs
ships in-image for `gs://`):

  * pattern expansion (`expand_patterns`) replaces `glob.glob`, which
    silently returns nothing for URLs;
  * shard bytes are fetched whole (`fetch_bytes`) and parsed by the same
    native TFRecord codec via its in-memory entry point
    (`native_io.read_tfrecords_bytes`) — one GET per ~100 MB shard, the
    access pattern tf.data used too;
  * checkpoints: Orbax/tensorstore already speak `gs://` natively, so
    `training/checkpoint.py` only needs to keep `os.path.abspath`/
    `makedirs` away from URLs (`is_remote_path` gates that).

Local paths never touch fsspec — the native `fopen` path stays the fast
path.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

from . import native_io


def is_remote_path(path: str) -> bool:
    """True for `scheme://...` URLs (gs://, s3://, memory://, ...)."""
    return "://" in path


def _fs_for(url: str):
    import fsspec

    fs, path = fsspec.core.url_to_fs(url)
    return fs, path


def _with_protocol(fs, path: str) -> str:
    proto = fs.protocol if isinstance(fs.protocol, str) else fs.protocol[0]
    if proto in ("file", "local"):
        return path
    return fs.unstrip_protocol(path)


def expand_patterns(patterns: List[str]) -> List[str]:
    """Glob-expand a mixed list of local/remote patterns.

    Remote patterns go through the filesystem's own `glob`; a pattern with
    no matches is kept verbatim (same contract as the trainer's local
    expansion — the loader then fails loudly naming the missing path).
    """
    expanded: List[str] = []
    for p in patterns:
        if is_remote_path(p):
            fs, path = _fs_for(p)
            matches = sorted(fs.glob(path))
            expanded.extend(
                [_with_protocol(fs, m) for m in matches] if matches else [p]
            )
        else:
            import glob

            matches = sorted(glob.glob(p))
            expanded.extend(matches if matches else [p])
    return expanded


def fetch_bytes(url: str) -> bytes:
    """Read a whole remote object."""
    import fsspec

    with fsspec.open(url, "rb") as f:
        return f.read()


def fetch_bytes_batch(urls) -> list:
    """Read many remote objects concurrently (`fs.cat` issues the GETs in
    parallel); returns bytes in input order.

    URLs are grouped by filesystem: a mixed-protocol list (e.g. gs:// and
    s3:// entries interleaved) issues one batched cat per store instead of
    silently fetching every stripped path from the first URL's store."""
    if not urls:
        return []
    groups: dict = {}  # fs -> (indices, paths)
    for i, u in enumerate(urls):
        fs, path = _fs_for(u)
        groups.setdefault(fs, ([], []))
        groups[fs][0].append(i)
        groups[fs][1].append(path)
    results: list = [None] * len(urls)
    for fs, (indices, paths) in groups.items():
        out = fs.cat(paths)
        for i, p in zip(indices, paths):
            results[i] = out[p]
    return results


def read_tfrecords_any(path: str) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """`native_io.read_tfrecords` for local paths; fetch+parse for URLs."""
    if is_remote_path(path):
        return native_io.read_tfrecords_bytes(fetch_bytes(path), name=path)
    return native_io.read_tfrecords(path)


def find_files_remote(data_dir: str, suffix: str) -> List[str]:
    """Recursive suffix search on a remote directory (fsspec `find`)."""
    fs, path = _fs_for(data_dir)
    return sorted(
        _with_protocol(fs, p) for p in fs.find(path) if p.endswith(suffix)
    )


def open_text(path: str):
    """Text-mode open that understands URLs."""
    if is_remote_path(path):
        import fsspec

        return fsspec.open(path, "r").open()
    return open(path)
