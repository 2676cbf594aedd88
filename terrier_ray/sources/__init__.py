from terrier_ray.sources.io import (  # noqa: F401
    read_csv_table,
    write_csv,
    write_parquet_partitioned,
    export_arrow_ipc,
    read_arrow_ipc,
)
