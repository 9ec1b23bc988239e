from .adapter import (  # noqa: F401
    ENERGY_EVENTS_SQL,
    energy_events,
    load_table,
    oracle_with_energy_events,
)
