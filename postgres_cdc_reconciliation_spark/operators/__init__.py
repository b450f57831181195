from .status import (  # noqa: F401
    batch_replication_status,
    latest_batch_replication_status,
    multiple_tables_replication_status,
)
