"""Properties-file configuration surface — the reference is driven by a
``converter.properties`` file (REF/cfg/ConverterConfiguration.java:144-150
loads it; accessors at :160-288 read each key lazily with the defaults
reproduced below; per-column type-override keys
``TableConverter.specificColumnMapping.<col>`` are collected at
:264-278).  This module parses the SAME key names and defaults into a
:class:`ConverterConfig` whose :meth:`convert_all_kwargs` /
:meth:`convert_table_jdbc_kwargs` map directly onto the orchestrator
(``converter.convert_all`` / ``converter.convert_table_jdbc``), so a
drop-in user can point their existing properties file at this engine.

Key map (reference key → engine kwarg):

* ``TableConverter.convertMode``            → ``ddl_mode``
* ``DataConverter.convertMode``             → ``data_mode``
* ``DataConverter.numberOfTableWorkers``    → ``max_table_workers`` (X1)
* ``DataConverter.maxNumberOfWorkers``      → ``num_partitions`` on the
  JDBC writer (the reference's per-table upload-worker cap, X4/X6)
* ``TableConverter.specificColumnMapping.*``→ ``type_overrides`` (P7;
  table-qualified key wins over bare column, types.py:186-200)
* ``DataConverter.batchSize`` et al. are carried for parity; Spark's
  cost model (copy.spanner_batch_rows) sizes physical batches, and the
  worker-wait keys are meaningless under a driver-scheduled engine but
  are parsed and surfaced rather than rejected.

Destination dialect comes from the JDBC url exactly like
``DatabaseType.getType`` (REF/cfg/ConverterConfiguration.java:79-85):
``jdbc:cloudspanner...`` → cloudspanner, ``jdbc:postgresql...`` →
postgresql, anything else → None (caller supplies the dialect).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from spanner_jdbc_converter_spark.modes import ConvertMode

_MODE_BY_NAME = {m.value: m for m in ConvertMode}

#: Reference defaults (REF/cfg/ConverterConfiguration.java:160-288).
_DEFAULT_BATCH_SIZE = 1_500_000
_DEFAULT_TABLE_WORKERS = 10
_DEFAULT_MAX_WORKERS = 10
_DEFAULT_WAIT_MINUTES = 60
_DEFAULT_MAX_STATEMENTS_PER_BATCH = 10_000

_COLUMN_MAPPING_PREFIX = "TableConverter.specificColumnMapping."


def load_properties(path: str | Path) -> dict[str, str]:
    """Minimal ``java.util.Properties`` reader: ``#``/``!`` comments,
    ``key=value`` / ``key: value`` pairs, trailing-backslash line
    continuations.  Enough to load the reference's own
    ``converter.properties.example`` byte-for-byte."""
    props: dict[str, str] = {}
    pending = ""
    for raw in Path(path).read_text().splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line.startswith(("#", "!")):
            continue
        if line.endswith("\\"):
            pending = line[:-1]
            continue
        for sep in ("=", ":"):
            if sep in line:
                key, _, value = line.partition(sep)
                props[key.strip()] = value.strip()
                break
    return props


def database_type(url: str | None) -> str | None:
    """JDBC url → engine dialect string (DatabaseType.getType,
    REF/cfg/ConverterConfiguration.java:79-85)."""
    if not url:
        return None
    low = url.lower()
    if low.startswith("jdbc:cloudspanner"):
        return "cloudspanner"
    if low.startswith("jdbc:postgresql"):
        return "postgresql"
    return None


def parse_convert_mode(name: str) -> ConvertMode:
    """The reference's ``ConvertMode.valueOf`` — unknown names throw
    (there is no lenient fallback in the reference either)."""
    try:
        return _MODE_BY_NAME[name]
    except KeyError:
        raise ValueError(
            f"unknown ConvertMode {name!r}; expected one of {sorted(_MODE_BY_NAME)}"
        ) from None


@dataclass
class ConverterConfig:
    """Parsed configuration with the reference's defaults baked in."""

    url_source: str | None = None
    url_destination: str | None = None
    table_convert_mode: ConvertMode = ConvertMode.SKIP_EXISTING
    data_convert_mode: ConvertMode = ConvertMode.SKIP_EXISTING
    batch_size: int = _DEFAULT_BATCH_SIZE
    number_of_table_workers: int = _DEFAULT_TABLE_WORKERS
    max_number_of_workers: int = _DEFAULT_MAX_WORKERS
    table_worker_max_wait_minutes: int = _DEFAULT_WAIT_MINUTES
    upload_worker_max_wait_minutes: int = _DEFAULT_WAIT_MINUTES
    use_jdbc_batching: bool = True
    max_statements_in_one_jdbc_batch: int = _DEFAULT_MAX_STATEMENTS_PER_BATCH
    catalog: str | None = None
    schema: str | None = None
    max_records_in_single_delete_statement: int | None = None
    column_overrides: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_properties(
        cls,
        path: str | Path,
        url_source: str | None = None,
        url_destination: str | None = None,
    ) -> "ConverterConfig":
        """Load a reference-format properties file
        (REF/cfg/ConverterConfiguration.java:144-150 + accessors)."""
        p = load_properties(path)
        cfg = cls(
            url_source=url_source,
            url_destination=url_destination,
            table_convert_mode=parse_convert_mode(
                p.get("TableConverter.convertMode", ConvertMode.SKIP_EXISTING.value)
            ),
            data_convert_mode=parse_convert_mode(
                p.get("DataConverter.convertMode", ConvertMode.SKIP_EXISTING.value)
            ),
            batch_size=int(p.get("DataConverter.batchSize", _DEFAULT_BATCH_SIZE)),
            number_of_table_workers=int(
                p.get("DataConverter.numberOfTableWorkers", _DEFAULT_TABLE_WORKERS)
            ),
            max_number_of_workers=int(
                p.get("DataConverter.maxNumberOfWorkers", _DEFAULT_MAX_WORKERS)
            ),
            table_worker_max_wait_minutes=int(
                p.get("DataConverter.tableWorkerMaxWaitInMinutes", _DEFAULT_WAIT_MINUTES)
            ),
            upload_worker_max_wait_minutes=int(
                p.get("DataConverter.uploadWorkerMaxWaitInMinutes", _DEFAULT_WAIT_MINUTES)
            ),
            use_jdbc_batching=p.get("DataConverter.useJdbcBatching", "true").lower()
            == "true",
            max_statements_in_one_jdbc_batch=int(
                p.get(
                    "DataConverter.maxStatementsInOneJdbcBatch",
                    _DEFAULT_MAX_STATEMENTS_PER_BATCH,
                )
            ),
            catalog=p.get("catalog"),
            schema=p.get("schema"),
            column_overrides={
                k[len(_COLUMN_MAPPING_PREFIX):]: v
                for k, v in p.items()
                if k.startswith(_COLUMN_MAPPING_PREFIX)
            },
        )
        # setDefaults (REF/cfg/ConverterConfiguration.java:152-158): a
        # Cloud Spanner destination bounds single-transaction deletes by
        # the batch size unless explicitly configured
        raw = p.get("DataConverter.maxRecordsInSingleDeleteStatement")
        if raw is not None:
            cfg.max_records_in_single_delete_statement = int(raw)
        elif cfg.destination_dialect() == "cloudspanner":
            cfg.max_records_in_single_delete_statement = cfg.batch_size
        return cfg

    def destination_dialect(self, default: str | None = None) -> str | None:
        return database_type(self.url_destination) or default

    def convert_all_kwargs(self, dialect_default: str = "cloudspanner") -> dict:
        """kwargs for :func:`converter.convert_all` (parquet destination)."""
        return {
            "ddl_mode": self.table_convert_mode,
            "data_mode": self.data_convert_mode,
            "dialect": self.destination_dialect(dialect_default),
            "max_table_workers": self.number_of_table_workers,
            "type_overrides": dict(self.column_overrides),
        }

    def convert_table_jdbc_kwargs(self, dialect_default: str = "postgresql") -> dict:
        """kwargs for :func:`converter.convert_table_jdbc` (live JDBC
        destination).  ``maxNumberOfWorkers`` caps the parallel upload
        connections exactly like the reference's upload-worker pool
        (REF/data/DataCopier.java:167-178)."""
        kwargs = {
            "ddl_mode": self.table_convert_mode,
            "data_mode": self.data_convert_mode,
            "dialect": self.destination_dialect(dialect_default),
            "num_partitions": self.max_number_of_workers,
            "type_overrides": dict(self.column_overrides),
        }
        if self.url_destination:
            kwargs["url"] = self.url_destination
        return kwargs
