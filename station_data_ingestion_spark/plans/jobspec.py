"""Job specification: the config contract that drives ingestion.

Mirrors the reference's config schema [reference: README.md:8-39,
src/example_config.json:1-34] but is validated eagerly at analysis time
(bad date range fails before any I/O, like src/driver.py:132-134).

The spec is plain data; the engine turns it into a DataFrame program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from station_data_ingestion_spark.functions.dates import DateRange

# Canonical renames of known station-metadata columns
# [reference: src/driver.py:9-23]. Header columns that are neither known
# metadata nor in-range date headers are DROPPED [src/driver.py:46-57].
METADATA_COL_TRANSLATIONS: dict[str, str] = {
    "SKN": "skn",
    "Station.Name": "name",
    "Observer": "observer",
    "Network": "network",
    "Island": "island",
    "ELEV.m.": "elevation_m",
    "LAT": "lat",
    "LON": "lng",
    "NCEI.id": "ncei_id",
    "NWS.id": "nws_id",
    "NESDIS.id": "nesdis_id",
    "SCAN.id": "scan_id",
    "SMART_NODE_RF.id": "smart_node_rf_id",
}

# Composite merge key [reference: src/tapis_direct_driver.py:72-73].
BASE_KEY_FIELDS: tuple[str, ...] = ("datatype", "period", "date", "fill", "station_id")


@dataclass
class DataItemSpec:
    """One ingestion job: a set of wide CSV files sharing parameters."""

    files: list[str]
    datatype: str
    period: str
    fill: str
    start_date: str
    end_date: str
    nodata: str = "NA"
    replace_duplicates: bool = True
    data_col_start: int = 1
    id_col: int = 0
    additional_properties: dict[str, Any] = field(default_factory=dict)
    additional_key_properties: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        # Analysis-time validation (raises before any I/O).
        self.date_range  # noqa: B018 -- force validation

    @property
    def date_range(self) -> DateRange:
        return DateRange.from_iso(self.start_date, self.end_date, self.period)

    @property
    def key_fields(self) -> list[str]:
        return list(BASE_KEY_FIELDS) + list(self.additional_key_properties)

    @property
    def static_properties(self) -> dict[str, Any]:
        """Constant columns attached to every observation row."""
        return {
            "datatype": self.datatype,
            "period": self.period,
            "fill": self.fill,
            **self.additional_properties,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DataItemSpec":
        # Unknown keys are IGNORED, not rejected -- the reference reads
        # only the keys it knows and tolerates extras [reference:
        # src/tapis_direct_driver.py:43-73 config.get defaults], so a
        # shared config can carry fields for other consumers. The
        # trade-off (a typoed key silently falls back to its default) is
        # inherited deliberately.
        known = {
            "files", "datatype", "period", "fill", "start_date", "end_date",
            "nodata", "replace_duplicates", "data_col_start", "id_col",
            "additional_properties", "additional_key_properties",
        }
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class JobSpec:
    """Top-level job config: a list of data items plus sink settings."""

    data: list[DataItemSpec]
    location: str = "hawaii"
    retries: int = 3
    concurrency: int = 4

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "JobSpec":
        return cls(
            data=[DataItemSpec.from_dict(item) for item in d.get("data", [])],
            location=d.get("location", "hawaii"),
            retries=int(d.get("retries", 3)),
            concurrency=int(d.get("concurrency", 4)),
        )
