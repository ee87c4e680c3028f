"""Driver-side filesystem shim over pyarrow.fs.

The work-unit / manifest / stats layer must run against whatever
filesystem holds the index (the reference keeps its lease store in
DynamoDB and its data on S3 for the same reason — reference
core/sourcecoordination/LeaseBasedSourceCoordinator.java:157). Plain
``os.*`` calls silently pin that layer to the driver's local disk;
every call here resolves the path's scheme through
``pyarrow.fs.FileSystem.from_uri`` instead, so ``file://``, ``s3://``
etc. behave identically. Bare paths stay on the fast local path.

Only driver-side metadata I/O goes through this module — bulk data
reads/writes stay with Spark's Hadoop readers, which handle URIs
natively.
"""

from __future__ import annotations

import posixpath

from pyarrow import fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-internal path) for a bare path or URI."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _rejoin(orig: str, inner: str) -> str:
    """Re-attach the original scheme prefix to an fs-internal path."""
    if "://" in orig:
        scheme = orig.split("://", 1)[0]
        return f"{scheme}://{inner.lstrip('/') if scheme == 's3' else inner}"
    return inner


def listdir(path: str, suffix: str | None = None) -> list[str]:
    """Sorted child paths (same scheme as the input); [] if absent."""
    f, p = resolve(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    out = [
        _rejoin(path, i.path)
        for i in infos
        if suffix is None or i.path.endswith(suffix)
    ]
    return sorted(out)


def du(path: str) -> int:
    """Total bytes of all files under path (0 if absent) — one
    recursive listing, works on any pyarrow filesystem."""
    f, p = resolve(path)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=True))
    except (FileNotFoundError, OSError):
        return 0
    return sum(i.size or 0 for i in infos if i.is_file)


def isdir(path: str) -> bool:
    f, p = resolve(path)
    return f.get_file_info(p).type == pafs.FileType.Directory


def exists(path: str) -> bool:
    f, p = resolve(path)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def makedirs(path: str) -> None:
    f, p = resolve(path)
    f.create_dir(p, recursive=True)


def read_text(path: str) -> str:
    f, p = resolve(path)
    with f.open_input_stream(p) as s:
        return s.read().decode("utf-8")


def write_text(path: str, text: str) -> None:
    f, p = resolve(path)
    with f.open_output_stream(p) as s:
        s.write(text.encode("utf-8"))


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Write-tmp-then-move commit. Atomic rename on POSIX; on object
    stores move is copy+delete, but the manifest protocol only needs
    'never observe a partial file', which both provide (S3 PUTs are
    already all-or-nothing)."""
    f, p = resolve(path)
    d, name = posixpath.split(p)
    tmp = posixpath.join(d, "." + name + ".tmp")
    with f.open_output_stream(tmp) as s:
        s.write(data)
    f.move(tmp, p)


def rmtree(path: str) -> None:
    """Recursive directory delete; silent no-op if absent."""
    f, p = resolve(path)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def remove(path: str) -> None:
    """Single-file delete; raises if absent (callers that need
    must-exist semantics — e.g. closing a PIT token — want the loud
    failure, unlike rmtree's idempotent sweep)."""
    f, p = resolve(path)
    f.delete_file(p)


def open_input_file(path: str):
    """Random-access input file handle (works for bare paths and URIs;
    pass to pyarrow.parquet.ParquetFile)."""
    f, p = resolve(path)
    return f.open_input_file(p)


def open_output_stream(path: str):
    """Sequential output stream (pass to pyarrow.parquet.ParquetWriter)."""
    f, p = resolve(path)
    return f.open_output_stream(p)


def move(src: str, dst: str) -> None:
    """Rename/move within one filesystem. POSIX rename replaces an
    existing destination atomically; object stores copy+delete — both
    give the 'never observe a partial file' guarantee the token-commit
    protocol needs."""
    f, p = resolve(src)
    _, q = resolve(dst)
    f.move(p, q)


def basename(path: str) -> str:
    return posixpath.basename(path.rstrip("/"))
