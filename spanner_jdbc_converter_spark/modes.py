"""ConvertMode semantics (SURVEY.md §1.5) → Spark SaveMode.

The reference applies ``ConvertMode = {SkipAll, SkipExisting,
DropAndRecreate, ThrowExceptionIfExists}`` independently to the DDL and
data phases (REF/ConvertMode.java:3-6,
REF/cfg/ConverterConfiguration.java:160-178).
"""

from __future__ import annotations

import enum


class ConvertMode(enum.Enum):
    SKIP_ALL = "SkipAll"
    SKIP_EXISTING = "SkipExisting"
    DROP_AND_RECREATE = "DropAndRecreate"
    THROW_IF_EXISTS = "ThrowExceptionIfExists"


#: ConvertMode → DataFrameWriter mode string (SURVEY.md §1.5 table).
_SAVE_MODE = {
    ConvertMode.SKIP_ALL: None,  # phase skipped entirely (REF/Converter.java:72)
    ConvertMode.SKIP_EXISTING: "ignore",
    ConvertMode.DROP_AND_RECREATE: "overwrite",
    ConvertMode.THROW_IF_EXISTS: "error",
}


def to_save_mode(mode: ConvertMode) -> str | None:
    """None ⇒ the whole phase is a no-op."""
    return _SAVE_MODE[mode]


def should_copy_data(mode: ConvertMode, destination_empty: bool) -> bool:
    """Data-phase gate: SkipExisting copies only into empty destinations
    (README.md:17-18); DropAndRecreate always copies (after delete);
    ThrowExceptionIfExists copies only when empty (else the DDL phase threw)."""
    if mode is ConvertMode.SKIP_ALL:
        return False
    if mode is ConvertMode.DROP_AND_RECREATE:
        return True
    return destination_empty
