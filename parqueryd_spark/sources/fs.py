"""Hadoop ``FileSystem`` gateway — scheme-aware filesystem ops for publication.

The reference's moveparquet layer exists precisely to serve object-store-sourced
data (worker.py:544-594 downloads from S3/Azure; worker.py:689-779 swaps files
into the serving dir), so the Spark analog's publish/probe paths must work on
any Hadoop-supported scheme (``file:``, ``s3a:``, ``abfss:``, ``gs:``, ...),
not just a POSIX mount. This wraps the same JVM-side ``FileSystem`` resolution
Spark's own reader uses (see ``sources/parquet.py:_exists``) behind the small
op set publication needs: exists / rename / delete / mkdirs / liststatus.

Semantics note: Hadoop ``rename`` returns ``False`` on failure instead of
raising, and (unlike POSIX) does not replace an existing destination —
``rename_or_raise`` converts failure to ``OSError`` so callers keep one error
path. On true object stores a "rename" is a copy+delete and not atomic; the
docstrings on the publish functions call out the table-format upgrade path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class HadoopFS:
    """One resolved Hadoop FileSystem (from an anchor path's scheme)."""

    def __init__(self, spark: SparkSession, anchor_path: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(anchor_path).getFileSystem(spark._jsc.hadoopConfiguration())

    def qualify(self, path: str) -> str:
        """Fully-qualified URI for ``path`` on this filesystem (bare local
        paths become ``file:/...``; relative paths resolve against the FS
        working dir — the cluster-correct analog of ``os.path.abspath``)."""
        return self._fs.makeQualified(self._Path(path)).toString()

    @staticmethod
    def parent(path: str) -> str:
        return path.rsplit("/", 1)[0]

    @staticmethod
    def name(path: str) -> str:
        return path.rstrip("/").rsplit("/", 1)[1]

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._Path(path)))

    def is_dir(self, path: str) -> bool:
        p = self._Path(path)
        return bool(self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory())

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def delete(self, path: str) -> None:
        """Recursive delete; no-op if absent (``shutil.rmtree(ignore_errors)``
        analog)."""
        self._fs.delete(self._Path(path), True)

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._Path(src), self._Path(dst)))

    def rename_or_raise(self, src: str, dst: str) -> None:
        if not self.rename(src, dst):
            raise OSError(f"rename failed: {src} -> {dst}")

    def listdir(self, path: str) -> list[str]:
        """Child basenames of a directory (``os.listdir`` analog)."""
        return [st.getPath().getName() for st in self._fs.listStatus(self._Path(path))]

    def list_files(self, path: str, suffix: str | None = ".parquet") -> list[str]:
        """Fully-qualified data-file paths under ``path`` (recursive), skipping
        hidden/marker entries (``_SUCCESS``, ``.crc``, ``_metadata``). A
        ``path`` that is itself a file returns ``[path]`` — datasets are
        sometimes a single parquet file (the testdata layout), sometimes a
        directory of parts (Spark writes)."""
        if not self.is_dir(path):
            return [self.qualify(path)]
        out: list[str] = []

        def walk(p: str) -> None:
            for st in self._fs.listStatus(self._Path(p)):
                name = st.getPath().getName()
                if name.startswith(("_", ".")):
                    continue
                q = st.getPath().toString()
                if st.isDirectory():
                    walk(q)
                elif suffix is None or name.endswith(suffix):
                    out.append(q)

        walk(path)
        return sorted(out)
