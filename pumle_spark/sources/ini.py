"""S1: INI config scan (reference ini.py:108-158).

The reference parses setup.ini into a nested Dict[section][param] with
schema-driven float/bool casts (ini.py:85-106; schema pumle.py:35-67).
Here: configparser on the driver (one tiny file) → a ONE-ROW DataFrame with
flattened `section__param` columns (the metadata.py:119-129 naming), plus
the raw nested dict for hash computation. The DataFrame is the base row the
sweep generator crossJoins against.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# (section, param) → cast; mirrors PARAMETERS_SCHEMA pumle.py:35-67:
# FLUID params are all float; schedule steps int; booleans from _flag suffix.
FLOAT_SECTIONS = {"Fluid", "InitialConditions", "Wells"}
INT_PARAMS = {
    ("Schedule", "injection_time"),
    ("Schedule", "migration_time"),
    ("Schedule", "injection_timesteps"),
    ("Schedule", "migration_timesteps"),
}
BOOL_TRUE = {"true", "1", "yes", "on"}


def _cast(section: str, key: str, value: str):
    if (section, key) in INT_PARAMS:
        return int(value)
    if key.endswith("_flag"):  # ini.py:102-103
        return value.strip().lower() in BOOL_TRUE
    if section in FLOAT_SECTIONS:
        try:
            return float(value)  # ini.py:100-101
        except ValueError:
            return value
    return value


@dataclass
class IniConfig:
    params: dict[str, dict] = field(default_factory=dict)

    def section(self, name: str) -> dict:
        return self.params.get(name, {})


def read_ini(path: str) -> IniConfig:
    cp = configparser.ConfigParser()
    cp.optionxform = str  # preserve case, like the reference's raw keys
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(path)
    return IniConfig({s: {k: _cast(s, k, v) for k, v in cp.items(s)} for s in cp.sections()})


def ini_to_df(spark: SparkSession, cfg: IniConfig) -> DataFrame:
    """One-row DataFrame with section__param columns (metadata.py naming)."""

    def norm(s: str) -> str:
        return s.lower().replace(" ", "_").replace("-", "_")

    flat = {
        f"{norm(s)}__{norm(k)}": v for s, kv in cfg.params.items() for k, v in kv.items()
    }
    return spark.createDataFrame([flat])
