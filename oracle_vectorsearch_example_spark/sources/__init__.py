from oracle_vectorsearch_example_spark.sources.io import (
    TABLES,
    read_binary_files,
    read_table,
    validate_constraints,
)
from oracle_vectorsearch_example_spark.sources.registry import ModelRegistry
from oracle_vectorsearch_example_spark.sources.scd import scd2_apply, scd2_init
from oracle_vectorsearch_example_spark.sources.txn import (
    CommitConflict,
    Warehouse,
    merge_rows,
)
from oracle_vectorsearch_example_spark.sources.zips import (
    iter_zip,
    make_zip,
    read_zip_members,
    read_zip_ranges,
)
from oracle_vectorsearch_example_spark.sources.wds import (
    iter_tar,
    make_tar,
    read_tar_members,
    read_tar_ranges,
    read_webdataset,
    wds_samples,
    write_webdataset,
)
from oracle_vectorsearch_example_spark.sources.warc import (
    cdx_dedup,
    iter_warc,
    make_simple_warc,
    parse_cdxj,
    parse_warc,
    read_warc,
    read_warc_ranges,
    warc_cdx,
    warc_cdx_rows,
    warc_record_rows,
    write_cdxj,
    write_wet,
)

__all__ = [
    "cdx_dedup",
    "iter_warc",
    "make_simple_warc",
    "parse_cdxj",
    "parse_warc",
    "read_warc",
    "read_warc_ranges",
    "warc_cdx",
    "warc_cdx_rows",
    "warc_record_rows",
    "write_cdxj",
    "write_wet",
    "iter_tar",
    "make_tar",
    "read_tar_members",
    "read_tar_ranges",
    "read_webdataset",
    "wds_samples",
    "write_webdataset",
    "iter_zip",
    "make_zip",
    "read_zip_members",
    "read_zip_ranges",
    "TABLES",
    "read_table",
    "read_binary_files",
    "validate_constraints",
    "ModelRegistry",
    "Warehouse",
    "CommitConflict",
    "merge_rows",
    "scd2_init",
    "scd2_apply",
]
