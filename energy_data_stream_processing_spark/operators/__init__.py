from .hourly import HOURLY_ORACLE_BODY, hourly_business_metrics  # noqa: F401
