"""Configurable text analyzer shared by the native search read path
and its verification oracles.

The reference feeds Elasticsearch, whose mappings attach an ANALYZER
to every text field — the default `standard` analyzer lowercases,
language analyzers add stop-word removal and stemming, and every
query, aggregation, and suggester over analyzed text shifts with that
choice (the query text is analyzed with the same chain at search
time).  The engine's read path previously hardcoded one
lowercase+whitespace "simple analyzer" (DIVERGENCES.md S1); this
module makes the token pipeline a declared configuration:

    lowercase → whitespace split → drop empties
              → ascii folding → stop-word removal
              → suffix-strip / Porter stemming

``Analyzer`` renders the SAME pipeline three ways so results stay
hash-exact across engines:

* :meth:`tokens` — a Catalyst ``Column`` producing ``array<string>``
  (split / filter / transform — pure codegen-eligible builtins, no
  UDF) for document-side analysis inside Spark plans;
* :meth:`analyze` — a Python mirror for QUERY-side text (query terms
  must pass through the same chain, as ES does at search time);
* :meth:`sql_tokens` — a DuckDB expression mirror for the oracle SQL,
  generated from the same config so the oracle can never drift from
  the Spark plan.

The stemmer is deliberately "stemmer-lite": an ordered suffix-strip
list (first matching suffix strips, subject to a minimum remaining
stem length), the shape of Lucene's ``english_minimal`` /
``light_english`` filters — deterministic, exact, and expressible
identically in all three renderings.  Porter's full rule cascade is
out of scope; a user needing it plugs a custom suffix list or maps
tokens upstream.

Scale notes: the analyzer only ever appears inside a projection over
the corpus (one pass, no shuffle of its own); the stop list and
suffix list are compile-time literals folded into the plan, never a
join side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# the ES `_english_` stop set (Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET)
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

# light English suffix-strip rules, longest-first (the order IS the
# contract: 'ies' must strip before 'es' before 's')
LIGHT_ENGLISH_SUFFIXES: tuple[str, ...] = ("ies", "ing", "ed", "es", "s")


def _sq(s: str) -> str:
    """Escape a string for embedding in a single-quoted SQL literal
    (ADVICE r9: an apostrophe in a synonym/stopword otherwise breaks
    the rendered oracle SQL)."""
    return s.replace("'", "''")


@dataclass(frozen=True)
class Analyzer:
    """One analyzer configuration, rendered identically for Spark,
    Python, and DuckDB.  The default config (lowercase only) is
    exactly the engine's historical simple analyzer — passing
    ``Analyzer()`` anywhere is behavior-neutral."""

    lowercase: bool = True
    stopwords: tuple[str, ...] = ()
    stem_suffixes: tuple[str, ...] = ()
    min_stem: int = 3
    # full Porter algorithm (functions/porter.py) — the Lucene
    # PorterStemFilter the ES `english` analyzer runs; mutually
    # exclusive with the light suffix list
    porter: bool = False
    # ASCII folding (functions/folding.py — Lucene ASCIIFoldingFilter
    # / the deterministic subset of icu_folding): runs after
    # lowercase+split and BEFORE stop-word matching, the ES filter
    # order, so folded forms meet the stop set and the stemmer
    ascii_folding: bool = False
    # synonym token filter (the Lucene SynonymFilter single-token
    # subset: surface form → canonical form, ordered pairs so the
    # config stays hashable) — runs after stop removal and BEFORE
    # stemming, so canonical forms stem like any other token; query
    # text passes through the same map at search time, exactly as ES
    # applies a search_analyzer synonym filter
    synonyms: tuple = ()

    # -- Spark rendering ----------------------------------------------------

    def tokens(self, c: Column) -> Column:
        """``array<string>`` of analyzed tokens for a text Column."""
        base = F.trim(c)
        if self.lowercase:
            base = F.lower(base)
        arr = F.filter(F.split(base, r"\s+"), lambda t: t != F.lit(""))
        if self.ascii_folding:
            from monstache_spark.functions.folding import fold_col

            arr = F.transform(arr, fold_col)
        if self.stopwords:
            stops = F.array(*[F.lit(s) for s in self.stopwords])
            arr = F.filter(arr, lambda t: ~F.array_contains(stops, t))
        if self.synonyms:
            arr = F.transform(arr, self._syn_col)
        if self.porter:
            from monstache_spark.functions.porter import porter_tokens_col

            self._check_stemmers()
            arr = porter_tokens_col(arr)
        elif self.stem_suffixes:
            arr = F.transform(arr, self._stem_col)
        return arr

    def _syn_col(self, t: Column) -> Column:
        out = t
        for src, dst in reversed(self.synonyms):
            out = F.when(t == F.lit(src), F.lit(dst)).otherwise(out)
        return out

    def _check_stemmers(self) -> None:
        if self.porter and self.stem_suffixes:
            raise ValueError(
                "configure either porter=True or stem_suffixes, not both"
            )

    def _stem_col(self, t: Column) -> Column:
        out = t
        # build the CASE bottom-up so the FIRST matching suffix wins
        for suf in reversed(self.stem_suffixes):
            n = len(suf)
            out = F.when(
                t.endswith(suf) & (F.length(t) - n >= self.min_stem),
                t.substr(F.lit(1), F.length(t) - n),
            ).otherwise(out)
        return out

    def tokens_pos(self, c: Column) -> Column:
        """``array<struct<t,p>>`` of analyzed tokens WITH POSITIONS —
        Lucene's position-increment semantics: positions are assigned
        in the raw token sequence BEFORE stop-word removal, so
        removing a stop word leaves a GAP (the reason
        ``"quick fox"`` must not phrase-match ``"quick the fox"``).
        Stemming rewrites the token, never the position."""
        base = F.trim(c)
        if self.lowercase:
            base = F.lower(base)
        raw = F.filter(F.split(base, r"\s+"), lambda t: t != F.lit(""))
        if self.ascii_folding:
            from monstache_spark.functions.folding import fold_col

            pos = F.transform(
                raw,
                lambda t, i: F.struct(fold_col(t).alias("t"), i.alias("p")),
            )
        else:
            pos = F.transform(
                raw, lambda t, i: F.struct(t.alias("t"), i.alias("p"))
            )
        if self.stopwords:
            stops = F.array(*[F.lit(s) for s in self.stopwords])
            pos = F.filter(pos, lambda e: ~F.array_contains(stops, e["t"]))
        if self.synonyms:
            pos = F.transform(
                pos,
                lambda e: F.struct(
                    self._syn_col(e["t"]).alias("t"), e["p"].alias("p")
                ),
            )
        if self.porter:
            from monstache_spark.functions.porter import porter_tokens_col

            self._check_stemmers()
            ts = porter_tokens_col(F.transform(pos, lambda e: e["t"]))
            pos = F.zip_with(
                ts, pos,
                lambda t, e: F.struct(t.alias("t"), e["p"].alias("p")),
            )
        elif self.stem_suffixes:
            pos = F.transform(
                pos,
                lambda e: F.struct(
                    self._stem_col(e["t"]).alias("t"), e["p"].alias("p")
                ),
            )
        return pos

    # -- Python rendering (query-side) --------------------------------------

    def analyze_pos(self, text: str) -> list[tuple[str, int]]:
        """Python mirror of :meth:`tokens_pos` for query-side phrase
        analysis."""
        toks = (text.lower() if self.lowercase else text).split()
        out: list[tuple[str, int]] = []
        for i, t in enumerate([t for t in toks if t]):
            t = self._fold_py(t)
            if t in self.stopwords:
                continue
            out.append((self._stem_py(t), i))
        return out

    def _fold_py(self, t: str) -> str:
        if not self.ascii_folding:
            return t
        from monstache_spark.functions.folding import fold_py

        return fold_py(t)

    def _syn_py(self, t: str) -> str:
        for src, dst in self.synonyms:
            if t == src:
                return dst
        return t

    def _stem_py(self, t: str) -> str:
        t = self._syn_py(t)
        if self.porter:
            from monstache_spark.functions.porter import porter_stem_py

            self._check_stemmers()
            return porter_stem_py(t)
        for suf in self.stem_suffixes:
            if t.endswith(suf) and len(t) - len(suf) >= self.min_stem:
                return t[: -len(suf)]
        return t

    def analyze(self, text: str) -> list[str]:
        toks = (text.lower() if self.lowercase else text).split()
        out = []
        for t in toks:
            t = self._fold_py(t) if t else t
            if not t or t in self.stopwords:
                continue
            out.append(self._stem_py(t))
        return out

    # -- DuckDB rendering (oracle-side) -------------------------------------

    def sql_tokens(self, expr: str = "text") -> str:
        """A DuckDB list expression producing the same token array the
        Spark :meth:`tokens` Column produces — inline this in oracle
        SQL so both engines share one verbatim analyzer."""
        base = f"trim({expr})"
        if self.lowercase:
            base = f"trim(lower({expr}))"
        out = f"list_filter(string_split_regex({base}, '\\s+'), t -> t <> '')"
        if self.ascii_folding:
            from monstache_spark.functions.folding import fold_sql

            out = f"list_transform({out}, t -> {fold_sql('t')})"
        if self.stopwords:
            lst = "[" + ", ".join(f"'{_sq(s)}'" for s in self.stopwords) + "]"
            out = f"list_filter({out}, t -> NOT list_contains({lst}, t))"
        if self.synonyms:
            out = f"list_transform({out}, t -> {self._syn_sql('t')})"
        if self.porter:
            from monstache_spark.functions.porter import porter_tokens_sql

            self._check_stemmers()
            out = porter_tokens_sql(out)
        elif self.stem_suffixes:
            branches = []
            for suf in self.stem_suffixes:
                n = len(suf)
                branches.append(
                    f"WHEN ends_with(t, '{_sq(suf)}') AND length(t) - {n} >= "
                    f"{self.min_stem} THEN substr(t, 1, length(t) - {n})"
                )
            case = "CASE " + " ".join(branches) + " ELSE t END"
            out = f"list_transform({out}, t -> {case})"
        return out

    def _syn_sql(self, var: str) -> str:
        branches = " ".join(
            f"WHEN {var} = '{_sq(src)}' THEN '{_sq(dst)}'"
            for src, dst in self.synonyms
        )
        return f"CASE {branches} ELSE {var} END"


    def sql_tokens_pos(self, expr: str = "text") -> str:
        """DuckDB rendering of :meth:`tokens_pos`: list of
        ``{t, p}`` structs with pre-stop-removal positions."""
        base = f"trim({expr})"
        if self.lowercase:
            base = f"trim(lower({expr}))"
        raw = f"list_filter(string_split_regex({base}, '\\s+'), t -> t <> '')"
        if self.ascii_folding:
            from monstache_spark.functions.folding import fold_sql

            tok = fold_sql(f"({raw})[i]")
        else:
            tok = f"({raw})[i]"
        out = (
            f"list_transform(range(1, len({raw}) + 1), "
            f"i -> {{'t': {tok}, 'p': i - 1}})"
        )
        if self.stopwords:
            lst = "[" + ", ".join(f"'{_sq(s)}'" for s in self.stopwords) + "]"
            out = f"list_filter({out}, e -> NOT list_contains({lst}, e.t))"
        if self.synonyms:
            out = (
                f"list_transform({out}, "
                f"e -> {{'t': {self._syn_sql('e.t')}, 'p': e.p}})"
            )
        if self.porter:
            from monstache_spark.functions.porter import porter_tokens_sql

            self._check_stemmers()
            ts = porter_tokens_sql(f"list_transform({out}, e -> e.t)")
            out = (
                f"list_transform(range(1, len({out}) + 1), "
                f"i -> {{'t': ({ts})[i], 'p': ({out})[i].p}})"
            )
        elif self.stem_suffixes:
            branches = []
            for suf in self.stem_suffixes:
                n = len(suf)
                branches.append(
                    f"WHEN ends_with(e.t, '{_sq(suf)}') AND length(e.t) - {n} >= "
                    f"{self.min_stem} THEN substr(e.t, 1, length(e.t) - {n})"
                )
            case = "CASE " + " ".join(branches) + " ELSE e.t END"
            out = f"list_transform({out}, e -> {{'t': {case}, 'p': e.p}})"
        return out


# the ready-made "analyzed English" config mirroring an ES text field
# with `analyzer: english` in spirit: standard stop set + light stems
ENGLISH = Analyzer(
    stopwords=ENGLISH_STOPWORDS, stem_suffixes=LIGHT_ENGLISH_SUFFIXES
)

# the FULL `english` analyzer: standard stop set + the Porter
# algorithm Lucene's PorterStemFilter runs — closes the DIVERGENCES S1
# Porter residual (functions/porter.py; all three renderings are one
# expression tree, parity-tested over the corpus vocabulary)
ENGLISH_PORTER = Analyzer(stopwords=ENGLISH_STOPWORDS, porter=True)

# `asciifolding`-armed analyzers — the Latin-script subset of ES's ICU
# analysis (functions/folding.py; DIVERGENCES S1: folding closed,
# collation/CJK out of scope).  FOLDED is the bare filter; a
# non-English corpus plugs its own stop list / suffixes around it.
FOLDED = Analyzer(ascii_folding=True)
ENGLISH_FOLDED = Analyzer(
    ascii_folding=True,
    stopwords=ENGLISH_STOPWORDS,
    stem_suffixes=LIGHT_ENGLISH_SUFFIXES,
)
