from .iot import transform_iot_sensors  # noqa: F401
from .weather import transform_weather  # noqa: F401
