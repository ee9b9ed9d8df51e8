"""ASCII folding — the deterministic subset of ICU analysis.

The reference feeds Elasticsearch, where non-English corpora attach
the ``asciifolding`` token filter (Lucene ``ASCIIFoldingFilter``) or
the ICU plugin's ``icu_folding`` to text fields so that accented
surface forms (``café``, ``Müller``, ``señor``) meet their unaccented
query forms.  Full ICU (collation, script-specific normalization,
CJK segmentation) is declared out of scope in DIVERGENCES.md S1 — it
has no closed-form cross-engine rendering — but the folding step that
covers Latin-script corpora IS closed-form: a fixed character map.

This module renders that map three ways, the same contract as
:mod:`monstache_spark.functions.porter`:

* :func:`fold_col` — one ``translate`` Column (all 1:1 mappings) plus
  a short ``replace`` chain (the multi-char expansions) — pure
  codegen-eligible builtins, no UDF;
* :func:`fold_py` — the Python mirror for query-side text;
* :func:`fold_sql` — the DuckDB expression mirror for oracle SQL.

The map covers Latin-1 Supplement and Latin Extended-A lowercase
forms (folding runs AFTER ``lower()`` in the analyzer chain, so the
uppercase variants are already gone) — the rows of Lucene's
``ASCIIFoldingFilter`` a Latin-script corpus actually hits.  The
multi-char expansions (``ß→ss``, ``æ→ae``, ``œ→oe``, ``þ→th``,
``ĳ→ij``) cannot ride ``translate`` (1:1 by construction) and go
through literal ``replace`` calls, order-independent because the
source characters are disjoint from every other rule.

Scale notes: like the stemmer, folding only ever appears inside a
projection — one corpus pass, no shuffle, no join side; the map is a
compile-time literal folded into the plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1:1 codepoint map, applied as ONE translate() on every engine.
# Keys and values are same-length strings: position i of _FOLD_FROM
# maps to position i of _FOLD_TO.
_PAIRS: tuple[tuple[str, str], ...] = (
    # Latin-1 Supplement (lowercase)
    ("à", "a"), ("á", "a"), ("â", "a"), ("ã", "a"), ("ä", "a"), ("å", "a"),
    ("ç", "c"),
    ("è", "e"), ("é", "e"), ("ê", "e"), ("ë", "e"),
    ("ì", "i"), ("í", "i"), ("î", "i"), ("ï", "i"),
    ("ð", "d"), ("ñ", "n"),
    ("ò", "o"), ("ó", "o"), ("ô", "o"), ("õ", "o"), ("ö", "o"), ("ø", "o"),
    ("ù", "u"), ("ú", "u"), ("û", "u"), ("ü", "u"),
    ("ý", "y"), ("ÿ", "y"),
    # Latin Extended-A (lowercase)
    ("ā", "a"), ("ă", "a"), ("ą", "a"),
    ("ć", "c"), ("ĉ", "c"), ("ċ", "c"), ("č", "c"),
    ("ď", "d"), ("đ", "d"),
    ("ē", "e"), ("ĕ", "e"), ("ė", "e"), ("ę", "e"), ("ě", "e"),
    ("ĝ", "g"), ("ğ", "g"), ("ġ", "g"), ("ģ", "g"),
    ("ĥ", "h"), ("ħ", "h"),
    ("ĩ", "i"), ("ī", "i"), ("ĭ", "i"), ("į", "i"), ("ı", "i"),
    ("ĵ", "j"), ("ķ", "k"),
    ("ĺ", "l"), ("ļ", "l"), ("ľ", "l"), ("ŀ", "l"), ("ł", "l"),
    ("ń", "n"), ("ņ", "n"), ("ň", "n"),
    ("ō", "o"), ("ŏ", "o"), ("ő", "o"),
    ("ŕ", "r"), ("ŗ", "r"), ("ř", "r"),
    ("ś", "s"), ("ŝ", "s"), ("ş", "s"), ("š", "s"),
    ("ţ", "t"), ("ť", "t"), ("ŧ", "t"),
    ("ũ", "u"), ("ū", "u"), ("ŭ", "u"), ("ů", "u"), ("ű", "u"), ("ų", "u"),
    ("ŵ", "w"), ("ŷ", "y"),
    ("ź", "z"), ("ż", "z"), ("ž", "z"),
)
_FOLD_FROM = "".join(a for a, _ in _PAIRS)
_FOLD_TO = "".join(b for _, b in _PAIRS)

# multi-char expansions — literal replaces, disjoint source chars
_EXPANSIONS: tuple[tuple[str, str], ...] = (
    ("ß", "ss"),
    ("æ", "ae"),
    ("œ", "oe"),
    ("þ", "th"),
    ("ĳ", "ij"),
)

_FOLD_MAP = {a: b for a, b in _PAIRS} | {a: b for a, b in _EXPANSIONS}


def fold_py(token: str) -> str:
    """Fold one (already lowercased) token — the Python rendering."""
    return "".join(_FOLD_MAP.get(ch, ch) for ch in token)


def fold_col(c: Column) -> Column:
    """Fold a string Column: one ``translate`` for the 1:1 map, then
    the expansion replaces."""
    out = F.translate(c, _FOLD_FROM, _FOLD_TO)
    for src, dst in _EXPANSIONS:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def fold_sql(expr: str) -> str:
    """DuckDB rendering over a string expression."""
    out = f"translate({expr}, '{_FOLD_FROM}', '{_FOLD_TO}')"
    for src, dst in _EXPANSIONS:
        out = f"replace({out}, '{src}', '{dst}')"
    return out
