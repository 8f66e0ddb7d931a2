"""Declared output schemas.

Parity with the reference's ``FieldSchemaListBuilder``
(FieldSchemaListBuilder.java:27-34 — INTEGER/STRING/TIMESTAMP/BOOLEAN/RECORD
with REQUIRED/NULLABLE/REPEATED modes). The builder produces a Spark
``StructType``; ``REPEATED RECORD`` becomes ``ArrayType(StructType)``
(FieldSchemaListBuilder.java:244-249 → one level of nesting only, child rows
may not themselves contain repeats, MusicBrainzTransforms.java:288-293).
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaBuilder:
    """Fluent schema builder mirroring FieldSchemaListBuilder.java.

    >>> s = (SchemaBuilder()
    ...      .integer("artist_id", required=True)
    ...      .string("artist_name")
    ...      .timestamp("artist_last_updated")
    ...      .boolean("artist_ended")
    ...      .repeated_record("artist_recordings",
    ...                       SchemaBuilder().string("recording_name"))
    ...      .build())
    """

    def __init__(self) -> None:
        self._fields: list[T.StructField] = []

    def _add(self, name: str, dtype: T.DataType, required: bool) -> "SchemaBuilder":
        self._fields.append(T.StructField(name, dtype, nullable=not required))
        return self

    def integer(self, name: str, required: bool = False) -> "SchemaBuilder":
        # Reference widens all JSON ints to Long (JSONReader.java:46-51).
        return self._add(name, T.LongType(), required)

    def string(self, name: str, required: bool = False) -> "SchemaBuilder":
        return self._add(name, T.StringType(), required)

    def double(self, name: str, required: bool = False) -> "SchemaBuilder":
        return self._add(name, T.DoubleType(), required)

    def boolean(self, name: str, required: bool = False) -> "SchemaBuilder":
        return self._add(name, T.BooleanType(), required)

    def timestamp(self, name: str, required: bool = False) -> "SchemaBuilder":
        # Reference declares TIMESTAMP at the sink but never parses
        # (BQETLSimple.java:142,157); a typed engine parses with to_timestamp.
        return self._add(name, T.TimestampType(), required)

    def record(self, name: str, child: "SchemaBuilder",
               required: bool = False) -> "SchemaBuilder":
        return self._add(name, child.struct(), required)

    def repeated_record(self, name: str, child: "SchemaBuilder") -> "SchemaBuilder":
        # FieldSchemaListBuilder.java:244-249 (mode=REPEATED).
        return self._add(name, T.ArrayType(child.struct()), required=False)

    def struct(self) -> T.StructType:
        return T.StructType(self._fields)

    # Alias matching FieldSchemaListBuilder.schema() terminology.
    def build(self) -> T.StructType:
        return self.struct()

    @property
    def field_names(self) -> list[str]:
        return [f.name for f in self._fields]
