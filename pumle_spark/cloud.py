"""K8: cloud object-store I/O (reference cloud_storage.py:104-199).

The reference hand-rolls boto3 upload/download/list with per-file Python
calls (and a latent crash: `os` unimported at cloud_storage.py:101). The
Spark-native replacement is: configure the Hadoop S3A connector once, then
EVERY reader/writer in the engine takes an s3a:// URI — uploads are
df.write.parquet("s3a://bucket/key") with executor-parallel multipart puts,
no custom client, no driver bottleneck.

This environment has no object store; the module is the configuration
surface plus URI-transparent helpers, tested against local paths (the
helpers are storage-scheme agnostic by construction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

S3A_DEFAULTS = {
    # multipart tuning for large golden partitions
    "fs.s3a.multipart.size": "104857600",
    "fs.s3a.fast.upload": "true",
    "fs.s3a.connection.maximum": "64",
    # credentials come from the standard provider chain (env/instance role);
    # never inline secrets in job conf
    "fs.s3a.aws.credentials.provider": "com.amazonaws.auth.DefaultAWSCredentialsProviderChain",
}


def configure_s3a(spark: SparkSession, endpoint: str | None = None, extra: dict | None = None) -> None:
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    conf = dict(S3A_DEFAULTS)
    if endpoint:
        conf["fs.s3a.endpoint"] = endpoint
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        hconf.set(k, v)


def write_dataset(df: DataFrame, uri: str, partition_by: list[str] | None = None, fmt: str = "parquet") -> None:
    """Scheme-transparent dataset write (file://, s3a://, hdfs://…).
    Replaces per-file upload_file loops (cloud_storage.py:104-146): the
    executors write partitions directly to the store in parallel."""
    w = df.write.mode("overwrite").format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(uri)


def read_dataset(spark: SparkSession, uri: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(uri)


def list_objects(spark: SparkSession, uri_glob: str) -> DataFrame:
    """Listing (cloud_storage.py:173-199) as a DataFrame: binaryFile scan
    metadata only — path/size/mtime without reading payloads (Spark prunes
    the content column when unselected)."""
    return (
        spark.read.format("binaryFile")
        .load(uri_glob)
        .select("path", "length", F.col("modificationTime").alias("modification_time"))
    )
