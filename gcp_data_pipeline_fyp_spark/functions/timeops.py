"""Time expressions (reference P11, P16).

- `utc_to_local_string`: the reference's UTC->EEST conversion is itself
  inconsistent (full load adds a fixed +3h, `Full Load
  Scripts/ods_full_load2.py:39-45`; delta does a proper tz conversion,
  `Delta Load Scripts/ods_delta_load2.py:26-33` — they disagree during
  DST). Standardized here on the proper IANA conversion
  (Europe/Bucharest), formatted `yyyy-MM-dd HH:mm:ss`; parse failure ->
  NULL (try_to_timestamp).
- `date_dim_columns`: the date-dimension expansion
  (`Full Load Scripts/dw_full_load2.py:41-57`): yyyymmdd surrogate int,
  date, English day/month names, ISO weekday (Mon=1) and ISO week,
  month, quarter, year.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def utc_to_local_string(ts: Column | str, tz: str = "Europe/Bucharest") -> Column:
    """ISO-8601 UTC instant -> local wall-clock 'yyyy-MM-dd HH:mm:ss' string."""
    c = _c(ts)
    parsed = F.try_to_timestamp(c.cast("string"))
    return F.date_format(F.from_utc_timestamp(parsed, tz), "yyyy-MM-dd HH:mm:ss")


def date_dim_columns(date_col: Column | str) -> dict[str, Column]:
    """The 9 date-dimension attributes keyed by yyyymmdd int (dw_full_load2.py:41-57)."""
    d = _c(date_col).cast("date")
    return {
        "ID_date_ID": F.date_format(d, "yyyyMMdd").cast("int"),
        "DT_date": d,
        "LB_DayOfWeek": F.date_format(d, "EEEE"),
        "ID_DayOfWeekNb": (F.weekday(d) + F.lit(1)).cast("int"),  # ISO: Mon=1
        "ID_WeekNb": F.weekofyear(d).cast("int"),  # ISO week
        "LB_MonthName": F.date_format(d, "MMMM"),
        "ID_MonthNb": F.month(d).cast("int"),
        "ID_Quarter": F.quarter(d).cast("int"),
        "ID_Year": F.year(d).cast("int"),
    }


DATE_DIM_ORACLE_SQL = {
    # DuckDB equivalents, `{d}` = a DATE expression (oracle parity for P16)
    "ID_date_ID": "cast(strftime({d}, '%Y%m%d') as int)",
    "DT_date": "{d}",
    "LB_DayOfWeek": "dayname({d})",
    "ID_DayOfWeekNb": "cast(isodow({d}) as int)",
    "ID_WeekNb": "cast(weekofyear({d}) as int)",
    "LB_MonthName": "monthname({d})",
    "ID_MonthNb": "cast(month({d}) as int)",
    "ID_Quarter": "cast(quarter({d}) as int)",
    "ID_Year": "cast(year({d}) as int)",
}
