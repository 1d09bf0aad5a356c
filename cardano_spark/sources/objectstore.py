"""Object-store get/put/list seam (SURVEY §2.1 S9/S10) on the Hadoop
FileSystem API — the SAME abstraction ``s3a://`` implements, so the
code below runs unchanged against ``file://`` (tests), ``hdfs://``,
or ``s3a://bucket`` (the 100 TB deployment); only the base URI
changes.

The reference drives boto3 directly (upload_fileobj /
download_fileobj / a ListObjectsV2 paginator filtered by
last-modified, src/file_explorer/s3_file_explorer.py:18-51).  Spark's
data sources already cover the bulk read path (``modifiedAfter`` in
sources/files.py); this wrapper covers the residual imperative
surface — single-object get/put and watermark-filtered listing for
driver-side orchestration (manifest files, marker objects, small
control reads) — without importing any cloud SDK: the JVM that is
already running Spark carries the FileSystem implementations.

Timestamps: Hadoop reports modification time as epoch millis; the
listing exposes naive-UTC ``datetime`` (the reference converts S3's
tz-aware LastModified to naive UTC the same way,
s3_file_explorer.py:43-47), so watermark comparisons match the
ParquetWatermarkStore convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class ObjectInfo:
    """One listed object (the reference's FileInfo,
    src/models/file_info/file_info.py)."""

    path: str  # path relative to the store's base URI
    modified: datetime  # naive UTC
    size: int


class ObjectStore:
    """get/put/list over any Hadoop-supported filesystem URI."""

    def __init__(self, spark: SparkSession, base_uri: str):
        self.spark = spark
        self.base_uri = base_uri.rstrip("/")
        jvm = spark._jvm
        self._jvm = jvm
        self._fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI(self.base_uri),
            spark._jsc.hadoopConfiguration(),
        )

    def _jpath(self, rel: str):
        rel = rel.lstrip("/")
        return self._jvm.org.apache.hadoop.fs.Path(f"{self.base_uri}/{rel}")

    def _rel(self, jpath) -> str:
        full = jpath.toUri().getPath()
        base = self._jvm.java.net.URI(self.base_uri).getPath() or ""
        return full[len(base):].lstrip("/")

    # -- S10: get / put ------------------------------------------------

    def put(self, rel: str, data: bytes) -> None:
        """Upload one object (upload_buffer,
        s3_file_explorer.py:18-20). Overwrites."""
        out = self._fs.create(self._jpath(rel), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def get(self, rel: str) -> bytes:
        """Download one object fully into memory (download_to_buffer,
        s3_file_explorer.py:22-29). For bulk data use the Spark
        readers — this is the driver-side control-object path."""
        stream = self._fs.open(self._jpath(rel))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()

    def exists(self, rel: str) -> bool:
        return self._fs.exists(self._jpath(rel))

    def delete(self, rel: str) -> bool:
        return self._fs.delete(self._jpath(rel), True)

    # -- S9: listing with the watermark filter -------------------------

    def list_files(
        self, prefix: str = "", modified_after: datetime | None = None
    ) -> list[ObjectInfo]:
        """Recursive listing under a prefix, keeping only objects with
        ``mtime > modified_after`` (the reference's paginated
        ListObjectsV2 + last-modified filter,
        s3_file_explorer.py:31-51). Driver-side by design: this feeds
        orchestration decisions; bulk reads go through the Spark
        sources, whose listing is distributed."""
        root = self._jpath(prefix) if prefix else self._jpath("")
        if not self._fs.exists(root):
            return []
        out: list[ObjectInfo] = []
        it = self._fs.listFiles(root, True)
        while it.hasNext():
            st = it.next()
            mod = datetime.fromtimestamp(
                st.getModificationTime() / 1000.0, tz=timezone.utc
            ).replace(tzinfo=None)
            if modified_after is not None and mod <= modified_after:
                continue
            out.append(
                ObjectInfo(
                    path=self._rel(st.getPath()),
                    modified=mod,
                    size=st.getLen(),
                )
            )
        return sorted(out, key=lambda o: o.path)
