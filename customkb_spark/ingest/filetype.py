"""File-type detection + filename sanitization as column expressions.

Reference: extension→type mapping (database/chunking.py:64-137) and
dangerous-char sanitization (database/db_manager.py:97-162). Both are
pure string algebra — CASE/regexp on the path column, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EXT_TO_TYPE = {
    "md": "markdown", "markdown": "markdown",
    "html": "html", "htm": "html",
    "py": "code", "js": "code", "ts": "code", "java": "code", "go": "code",
    "rs": "code", "c": "code", "cpp": "code", "sh": "code", "rb": "code",
    "json": "json",
    "yaml": "yaml", "yml": "yaml",
    "xml": "xml",
    "ini": "config", "cfg": "config", "conf": "config", "toml": "config",
}


def detect_file_type(path_col: Column | str) -> Column:
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    ext = F.lower(F.regexp_extract(p, r"\.([A-Za-z0-9]+)$", 1))
    expr = F.lit("text")
    for e, t in _EXT_TO_TYPE.items():  # builds one CASE WHEN chain
        expr = F.when(ext == e, t).otherwise(expr)
    return expr


def sanitize_filename(path_col: Column | str) -> Column:
    """Replace dangerous shell chars in the BASENAME with underscores
    (directories untouched — the lookahead restricts matches to after
    the last '/'). Produces a display/storage-safe name; callers must
    keep the ORIGINAL path for filesystem access."""
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    return F.regexp_replace(p, "[<>|&;`$](?=[^/]*$)", "_")
