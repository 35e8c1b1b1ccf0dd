from activity_files_spark.functions.geo import (  # noqa: F401
    haversine_m,
    haversine_m_py,
    fit_semicircles_to_deg,
    fit_altitude_m,
    fit_timestamp,
    pace_s_per_km,
    lerp,
)
from activity_files_spark.functions.quadkey import (  # noqa: F401
    quadkey_col,
    quadkey_py,
    quadkey_np,
    tile_xy_py,
    quadkey_sql,
)
