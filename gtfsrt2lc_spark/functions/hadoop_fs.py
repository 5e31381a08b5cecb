"""Thin wrappers over the JVM Hadoop FileSystem API.

State stores and streaming replay guards must check/commit paths on whatever
filesystem Spark is actually writing to (HDFS, S3A, local, ...) — a driver
``os.path`` check silently answers "no" for any non-local URI, which round 1's
review flagged as an output-erasure hazard on cluster storage. Every helper
here resolves the path through ``FileSystem.get(uri, hadoopConf)`` so behavior
is identical on ``file:/``, ``hdfs:/`` and object stores.

Atomicity notes: ``rename`` is atomic on HDFS and POSIX local filesystems; on
S3A it is copy+delete (best available without a committer service).
``write_text_atomic`` is all-or-nothing ONLY for paths that do not already
exist (tmp + rename to a fresh name); overwriting an existing path requires a
delete first, which opens a crash window where the path is missing. Store
protocols must therefore commit by writing NEW names (e.g. ``HistoryStore``'s
``manifest-<seq>.json``, where readers resolve the highest sequence) rather
than flipping a single mutable pointer file.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete; True if something was removed."""
    fs, p = _fs_path(spark, path)
    return bool(fs.delete(p, True))


def read_text(spark: SparkSession, path: str) -> str:
    """Read a small control file (pointer / manifest) fully into a string."""
    fs, p = _fs_path(spark, path)
    jvm = spark._jvm
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
        return "\n".join(lines)
    finally:
        stream.close()


def write_text_atomic(spark: SparkSession, path: str, content: str) -> None:
    """Write a small control file via tmp-sibling + rename (atomic on
    HDFS/local; copy+delete on S3A). All-or-nothing only when ``path`` does
    not already exist — see the module docstring's atomicity notes."""
    fs, p = _fs_path(spark, path)
    tmp = spark._jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    stream = fs.create(tmp, True)
    try:
        stream.write(bytearray(content.encode("utf-8")))
    finally:
        stream.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise IOError(f"atomic rename failed: {tmp} -> {p}")


def list_dirs(spark: SparkSession, path: str) -> list[str]:
    """Names (not full paths) of immediate subdirectories; [] if missing."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().getName() for st in fs.listStatus(p) if st.isDirectory()
    )


def list_files(spark: SparkSession, path: str, prefix: str = "") -> list[str]:
    """Names of immediate plain files, optionally prefix-filtered; [] if
    the directory is missing."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isFile() and st.getPath().getName().startswith(prefix)
    )
