"""Header-date parsing/classification for wide station matrices.

Re-expresses the reference's date semantics (cited for parity, not copied):

- header regex ``^X\\d{4}\\.\\d{2}(\\.\\d{2})?$`` with strict strptime formats
  ``X%Y.%m.%d`` (period=day) / ``X%Y.%m`` (period=month)
  [reference: src/modules/date_parser.py:9-21,36-56]
- ISO output strings ``%Y-%m-%d`` / ``%Y-%m`` [date_parser.py:24-33,58-64]
- inclusive-at-both-ends date ranges [src/driver.py:54-55,115]
- unknown period -> ValueError [date_parser.py:14-15]

These functions run on the *driver* over column NAMES (cheap: one header
row), never over data -- so they cost nothing at 100 TB. Data-side date
predicates use native Spark ``to_date``/``between`` which push down to the
scan and enable partition pruning on date-partitioned tables.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

PERIOD_DAY = "day"
PERIOD_MONTH = "month"

_HEADER_FMT = {PERIOD_DAY: "X%Y.%m.%d", PERIOD_MONTH: "X%Y.%m"}
_ISO_FMT = {PERIOD_DAY: "%Y-%m-%d", PERIOD_MONTH: "%Y-%m"}
_HEADER_RE = {
    PERIOD_DAY: re.compile(r"^X[0-9]{4}\.[0-9]{2}\.[0-9]{2}$"),
    PERIOD_MONTH: re.compile(r"^X[0-9]{4}\.[0-9]{2}$"),
}


def _require_period(period: str) -> None:
    if period not in _HEADER_FMT:
        raise ValueError(f"Unknown period: {period!r} (expected 'day' or 'month')")


def is_date_header(name: str, period: str) -> bool:
    """True iff ``name`` is a date column header for the given period."""
    _require_period(period)
    return _HEADER_RE[period].match(name) is not None


def parse_date_header(name: str, period: str) -> datetime:
    """Strict-parse a header like ``X2022.03.01`` -> datetime (raises on mismatch)."""
    _require_period(period)
    return datetime.strptime(name, _HEADER_FMT[period])


def parse_iso(value: str, period: str) -> datetime:
    """Parse an ISO date string (``2022-03-01`` / ``2022-03``) per period."""
    _require_period(period)
    return datetime.strptime(value, _ISO_FMT[period])


def to_iso(dt: datetime, period: str) -> str:
    """Format a datetime as the period's ISO output string."""
    _require_period(period)
    return dt.strftime(_ISO_FMT[period])


def header_to_iso(name: str, period: str) -> str:
    """Header column name -> ISO date value string."""
    return to_iso(parse_date_header(name, period), period)


@dataclass(frozen=True)
class DateRange:
    """Inclusive [start, end] range over period-granular dates."""

    start: datetime
    end: datetime
    period: str

    @classmethod
    def from_iso(cls, start: str, end: str, period: str) -> "DateRange":
        _require_period(period)
        s, e = parse_iso(start, period), parse_iso(end, period)
        if e < s:
            raise ValueError(f"end_date {end!r} precedes start_date {start!r}")
        return cls(s, e, period)

    def contains(self, dt: datetime) -> bool:
        return self.start <= dt <= self.end

    def contains_header(self, name: str) -> bool:
        # A header that matches the date regex but is calendar-invalid
        # (X2022.13, X2021.02.29) raises ValueError here, aborting the
        # job at driver-side classification -- the reference does the
        # same (strict strptime after the regex match,
        # src/modules/date_parser.py:9-21 via src/driver.py:46-57).
        return self.contains(parse_date_header(name, self.period))
