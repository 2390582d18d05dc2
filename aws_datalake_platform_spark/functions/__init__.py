from .core import (  # noqa: F401
    date_partition,
    fahrenheit,
    mint_sensor_id,
    pseudonymize,
    pseudonymize_pandas_udf,
    quality_score,
)
