from .cdc import (  # noqa: F401
    envelope_from_json,
    read_cdc_stream,
    unwrap,
)
