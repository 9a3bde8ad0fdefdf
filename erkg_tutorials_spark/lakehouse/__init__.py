from erkg_tutorials_spark.lakehouse.versioned import (
    committed_versions,
    read_version,
    write_version,
)
