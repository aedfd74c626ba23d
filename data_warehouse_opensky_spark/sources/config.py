"""INI config parity (T1.24) — the reference's `config.ini` contract.

The reference parses `config.ini` with configparser, fail-fast on a
missing file or a missing `[database]` section (extract_script.py:13-30,
load_warehouse.py:19-30), and derives per-database connection settings
by overlaying `dbname` (load_warehouse.py:42-45). Reproduced here with
exceptions instead of `sys.exit(1)` (a library must not kill the
driver process), and with a typed `DbConfig` whose JDBC rendering
feeds the optional Spark staging sink (warehouse/export.py).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass


class ConfigError(ValueError):
    """Fail-fast config contract violation (reference exits 1)."""


def load_ini_db_config(path: str) -> dict[str, str]:
    """Parse the `[database]` section of a config.ini.

    Same checks, same order as extract_script.py:13-30: missing file →
    error; missing [database] section → error. Returns the section as
    a plain dict (the reference's `dict(config['database'])`).
    """
    if not os.path.exists(path):
        raise ConfigError(f"config file not found: {path}")
    config = configparser.ConfigParser()
    config.read(path)
    if "database" not in config:
        raise ConfigError(f"config file {path} must have a [database] section")
    return dict(config["database"])


@dataclass(frozen=True)
class DbConfig:
    """Typed view of the [database] section + dbname overlay
    (load_warehouse.py:42-45 `get_db_config`)."""

    host: str
    port: str
    user: str
    password: str
    dbname: str = ""

    @classmethod
    def from_ini(cls, path: str, dbname: str = "") -> "DbConfig":
        raw = load_ini_db_config(path)
        missing = [k for k in ("host", "port", "user", "password") if k not in raw]
        if missing:
            raise ConfigError(f"[database] section missing keys: {missing}")
        return cls(
            host=raw["host"],
            port=raw["port"],
            user=raw["user"],
            password=raw["password"],
            dbname=dbname,
        )

    def with_dbname(self, dbname: str) -> "DbConfig":
        """The reference's get_db_config(db_name) overlay."""
        return DbConfig(self.host, self.port, self.user, self.password, dbname)

    def jdbc_url(self) -> str:
        """postgresql+psycopg2://u:p@h:p/db (load_warehouse.py:52-55)
        rendered as the Spark-side JDBC equivalent."""
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }
