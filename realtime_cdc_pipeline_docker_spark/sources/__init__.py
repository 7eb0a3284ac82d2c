from .cdc import (  # noqa: F401
    DEBEZIUM_ENVELOPE_SCHEMA,
    ORDERS_PAYLOAD_SCHEMA,
    decode_envelope,
    orders_envelope,
    synth_orders_envelope,
)
