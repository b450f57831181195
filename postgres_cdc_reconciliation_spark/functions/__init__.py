from .lsn import (  # noqa: F401
    lsn_to_long,
    long_to_lsn,
    lsn_diff,
    pretty_bytes,
)
