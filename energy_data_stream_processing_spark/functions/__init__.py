from .columns import dsum, round_half_up, safe_div  # noqa: F401
