from .readers import (  # noqa: F401
    load_table,
    load_tables,
    read_csv_bom,
    read_json_dir,
    read_image_dir,
)
from .writers import write_parquet_table, write_json_export  # noqa: F401
