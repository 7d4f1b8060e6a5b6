"""JSON property extraction over string columns (extension surface;
the driver's events.props is a JSON string, FIXTURES.md section 1).

Two built-in paths, both JVM-side:
  * ``get_json_object`` — per-path extraction, no schema needed;
  * ``from_json`` — full parse to typed struct/map when many keys are read
    (one parse instead of N path scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_get(col: str | Column, path: str) -> Column:
    """Extract one JSON path as string (cast at the call site)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")


def parse_props(
    df: DataFrame,
    column: str = "props",
    schema: T.DataType | str = "map<string,string>",
    output: str = "props_map",
) -> DataFrame:
    """Parse a JSON string column once into a typed map/struct — prefer this
    over repeated get_json_object when extracting several keys."""
    return df.withColumn(output, F.from_json(F.col(column), schema))
