"""Schema / ColTemplate / SchemaTemplate — engine-independent schema logic.

Reference parity: src/bears/util/schema.py —
- ``Schema``: index_col + features_schema + ground_truths_schema +
  predictions_schema (:465-520), keep/remove_columns (:634-651),
  ``filter_df`` static column projection with allow_missing + sorted columns
  (:653-679).
- ``ColTemplate``: format-string templates ("{col_name}_TFIDF") compiled to
  regexes (:39-128); ``SchemaTemplate`` infers a Schema from raw column names
  (infer_from_columns :307-405).

Pure Python over column-name lists; the only Spark touchpoint is
``Schema.filter_df`` which emits a .select.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable

from bears_spark.types import MLType, MLTypeSchema


@dataclass
class Schema:
    index_col: str | None = None
    features_schema: MLTypeSchema = field(default_factory=dict)
    ground_truths_schema: MLTypeSchema = field(default_factory=dict)
    predictions_schema: MLTypeSchema = field(default_factory=dict)

    @property
    def columns(self) -> list[str]:
        cols = [] if self.index_col is None else [self.index_col]
        cols += list(self.features_schema) + list(self.ground_truths_schema) + list(self.predictions_schema)
        return cols

    @property
    def flattened(self) -> MLTypeSchema:
        out: MLTypeSchema = {}
        if self.index_col is not None:
            out[self.index_col] = MLType.INDEX
        out.update(self.features_schema)
        out.update({c: t for c, t in self.ground_truths_schema.items()})
        out.update({c: t for c, t in self.predictions_schema.items()})
        return out

    def keep_columns(self, cols: Iterable[str]) -> "Schema":
        keep = set(cols)
        return Schema(
            index_col=self.index_col if self.index_col in keep else None,
            features_schema={c: t for c, t in self.features_schema.items() if c in keep},
            ground_truths_schema={c: t for c, t in self.ground_truths_schema.items() if c in keep},
            predictions_schema={c: t for c, t in self.predictions_schema.items() if c in keep},
        )

    def remove_columns(self, cols: Iterable[str]) -> "Schema":
        drop = set(cols)
        return self.keep_columns([c for c in self.columns if c not in drop])

    def filter_df(self, df, allow_missing: bool = False):
        """Project to the schema's columns, sorted (filter_df :653-679)."""
        have = set(df.columns)
        want = self.columns
        missing = [c for c in want if c not in have]
        if missing and not allow_missing:
            raise ValueError(f"columns missing from DataFrame: {missing}")
        keep = sorted(c for c in want if c in have)
        return df.select(*keep)


@dataclass
class ColTemplate:
    """Format-string column template, e.g. ``"{col_name}_TFIDF"`` — compiled
    to a regex that extracts the base name (ColTemplate :39-128)."""

    template: str
    mltype: MLType = MLType.TEXT

    _PLACEHOLDER = re.compile(r"\{([a-zA-Z_][a-zA-Z0-9_]*)\}")

    def regex(self) -> re.Pattern:
        pat = ""
        pos = 0
        for m in self._PLACEHOLDER.finditer(self.template):
            pat += re.escape(self.template[pos : m.start()])
            pat += f"(?P<{m.group(1)}>.+)"
            pos = m.end()
        pat += re.escape(self.template[pos:])
        return re.compile(f"^{pat}$", re.IGNORECASE)

    def matches(self, col: str) -> bool:
        return self.regex().match(col) is not None

    def extract(self, col: str) -> dict[str, str] | None:
        m = self.regex().match(col)
        return m.groupdict() if m else None

    def render(self, **parts: str) -> str:
        return self.template.format(**parts)


@dataclass
class SchemaTemplate:
    """Infer a Schema from raw column names via templates
    (infer_from_columns :307-405): first template match wins per column."""

    index_template: ColTemplate | None = None
    feature_templates: list[ColTemplate] = field(default_factory=list)
    ground_truth_templates: list[ColTemplate] = field(default_factory=list)
    prediction_templates: list[ColTemplate] = field(default_factory=list)

    def infer_from_columns(self, columns: Iterable[str]) -> Schema:
        schema = Schema()
        for col in columns:
            if self.index_template and schema.index_col is None and self.index_template.matches(col):
                schema.index_col = col
                continue
            placed = False
            for tpl in self.ground_truth_templates:
                if tpl.matches(col):
                    schema.ground_truths_schema[col] = tpl.mltype
                    placed = True
                    break
            if placed:
                continue
            for tpl in self.prediction_templates:
                if tpl.matches(col):
                    schema.predictions_schema[col] = tpl.mltype
                    placed = True
                    break
            if placed:
                continue
            for tpl in self.feature_templates:
                if tpl.matches(col):
                    schema.features_schema[col] = tpl.mltype
                    break
        return schema
