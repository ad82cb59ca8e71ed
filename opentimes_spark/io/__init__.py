from opentimes_spark.io.read import TESTDATA_TABLES, read_table, read_tables
from opentimes_spark.io.write import write_sorted_partitioned

__all__ = [
    "TESTDATA_TABLES",
    "read_table",
    "read_tables",
    "write_sorted_partitioned",
]
