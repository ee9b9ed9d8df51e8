"""ES ingest-pipeline simulation over DataFrames.

The reference routes every synced document through a server-side ES
ingest pipeline when configured (monstache.go:222,270 ``Pipeline``
config, applied per bulk request at monstache.go:808; it even
installs one itself — the ``attachment`` pipeline, monstache.go:791).
The processors then run inside ES, invisible to the sync engine.
This module makes that stage a first-class, testable operator: a
pipeline definition (the same JSON processor list ES's
``PUT _ingest/pipeline`` takes) compiles to declarative Column
transformations — one Catalyst projection chain, no shuffle, no UDF.

Supported processors (the deterministic core): ``set`` (literal or
``copy_from``, ``override``), ``rename``, ``remove``, ``convert``,
``gsub``, ``lowercase``/``uppercase``/``trim``, ``split`` (the
separator is a REGEX, as ES documents), ``join``, ``append``,
``date`` (first-matching-format parse via try_to_timestamp),
``fingerprint``, ``grok`` (the built-in portable pattern library —
DIVERGENCES S32), ``dissect``, ``csv`` (separator-split into listed
target fields — the RFC-4180 quote dialect is NOT parsed; documented),
``urldecode``, ``html_strip`` (tag removal; entity decoding is not —
documented), ``bytes`` ("10kb" → 10240), ``uri_parts`` (flattened to
``<target>_<part>`` columns — an object field has no columnar
schema), ``sort``, ``kv`` (the explicit ``include_keys`` form —
ES's dynamic per-document field set has no columnar schema),
``foreach`` (element-wise sub-processors over an array field via ONE
``F.transform`` lambda — convert/case/trim/gsub/urldecode; the
sub-processor addresses the element as ``_ingest._value``, the ES
contract), and ``drop``.

Per-processor ``if`` conditions take the engine's shared painless→SQL
binding (a SQL boolean expression over the row, the same contract as
``script`` queries): value-producing processors apply PER ROW (rows
failing the condition keep their old value, exactly ES's semantics);
the two SCHEMA-level processors (``rename``, ``remove``) cannot vary
per row in a columnar engine and refuse an ``if`` loudly.  For
TYPE-CHANGING processors under ``if``: ``convert``/``date`` try_cast
the keep-old branch to the target type (one column, one type — a
condition-false value the type cannot represent becomes NULL, the
failure contract below); ``split``/``join`` have no lossless cast
between string and array, so applying them in place with ``if``
refuses — write to a distinct ``target_field``.

Option hygiene: each processor validates its option keys against an
allowlist and refuses unrecognized ones loudly (the typo'd
``ignore_missing`` class); ES's ``tag``/``description`` metadata and
``ignore_failure`` are accepted everywhere (NULL-on-failure is
already this module's only failure mode); ``on_failure`` handler
lists are named in the refusal.

Refused processors: ``script`` (arbitrary stateful painless — the S25
grounds), ``geoip``/``user_agent`` (versioned binary lookup databases
no independent engine can replicate), ``enrich`` (use the ES|QL
ENRICH command / a join), ``pipeline`` (compose lists in Python).

Failure contract: ``convert``/``date`` yield NULL on unparseable
input (ES's ``ignore_failure: true`` shape) — the strict fail-the-doc
mode has no row-level exception channel in a columnar plan.

Scale: every processor is a Column expression; the whole pipeline is
ONE whole-stage-codegen projection over the scan (``drop`` adds a
pushdown-eligible filter).  100 TB cost = the scan itself.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REFUSED = {
    "script": "arbitrary stateful painless (S25 grounds) — use the "
    "SQL-subset via set/copy_from or a mapper UDF",
    "geoip": "requires a versioned MaxMind binary database no "
    "independent engine can replicate",
    "user_agent": "requires a versioned regexes.yaml parse database",
    "enrich": "use the ES|QL ENRICH command or join the lookup frame",
    "pipeline": "compose processor lists in Python before compiling",
    "registered_domain": "requires the versioned Mozilla Public "
    "Suffix List (the same class as geoip's binary database); "
    "uri_parts extracts the raw host",
    "fail": "per-document exception control flow (aborts the doc "
    "with on_failure routing) — express the condition as a drop/"
    "filter or validate before compiling",
    "terminate": "per-document early-exit re-sequences the remaining "
    "processor chain per row; gate each later processor with `if` "
    "instead",
    "attachment": "Tika content extraction is the K8 file-enrichment "
    "hook (operators/files.py), not a columnar expression",
    "inference": "calls a deployed ML model (S31 grounds — never "
    "hash-verifiable against an independent oracle)",
    "circle": "geo-shape polygonization needs the geo type; the geo "
    "operators work over (lat, lon) columns (S26 grounds)",
    "redact": "requires the licensed Grok-redact pattern semantics; "
    "curation.pii_redact is the engine's redaction operator",
}

# Options each processor actually honors.  ES-common metadata options
# (`tag`, `description`) are accepted-and-ignored everywhere;
# `ignore_failure` is accepted because NULL-on-failure is already this
# module's only failure mode (the module docstring's contract).
# Anything else — including a typo'd `ignore_missing`, or ES's
# `on_failure` processor lists — refuses loudly, matching the module's
# loud-refusal stance (round-11 ADVICE).
_COMMON_OPTS = {"if", "tag", "description", "ignore_failure"}
_PROC_OPTS = {
    "set": {"field", "value", "copy_from", "override"},
    "rename": {"field", "target_field", "ignore_missing"},
    "remove": {"field", "ignore_missing"},
    "convert": {"field", "type", "target_field"},
    "gsub": {"field", "pattern", "replacement", "target_field"},
    "lowercase": {"field", "target_field"},
    "uppercase": {"field", "target_field"},
    "trim": {"field", "target_field"},
    "split": {"field", "separator", "target_field"},
    "join": {"field", "separator", "target_field"},
    "append": {"field", "value"},
    "date": {"field", "formats", "target_field"},
    "fingerprint": {"fields", "target_field", "method"},
    "grok": {"field", "patterns"},
    "dissect": {"field", "pattern"},
    "csv": {"field", "target_fields", "separator", "quote", "trim"},
    "urldecode": {"field", "target_field"},
    "html_strip": {"field", "target_field"},
    "bytes": {"field", "target_field"},
    "uri_parts": {"field", "target_field", "keep_original",
                  "remove_if_successful"},
    "sort": {"field", "order", "target_field"},
    "kv": {"field", "field_split", "value_split", "include_keys",
           "prefix"},
    "foreach": {"field", "processor", "ignore_missing"},
    "drop": {"if"},
    "json": {"field", "target_field"},
    "dot_expander": {"field", "override"},
    "date_index_name": {"field", "index_name_prefix", "date_rounding",
                        "index_name_format"},
    "reroute": {"destination", "dataset", "namespace", "type"},
    "network_direction": {"source_ip", "destination_ip",
                          "internal_networks", "target_field"},
    "community_id": {"source_ip", "destination_ip", "source_port",
                     "destination_port", "transport", "iana_number",
                     "seed", "target_field"},
}

_CONVERT_TYPES = {
    "integer": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _apply_conditional(
    df: DataFrame,
    field: str,
    new_val: Column,
    cond: str | None,
    cast_to: str | None = None,
) -> DataFrame:
    """Set ``field`` to ``new_val``, per-row gated by the optional
    ``if`` condition: rows failing it keep their old value (or NULL
    when the field did not exist — ES leaves the doc untouched, which
    for a new field is the same as null).

    ``cast_to``: for TYPE-CHANGING processors (convert/date) under a
    per-row ``if``, Spark would coerce both CASE branches to a common
    type (usually string), silently defeating the conversion — the
    keep-old branch is therefore ``try_cast`` to the target type (one
    column, one type; a condition-false value the target type cannot
    represent becomes NULL, the processor's documented failure
    shape)."""
    if cond is None:
        return df.withColumn(field, new_val)
    c = F.coalesce(F.expr(cond), F.lit(False))
    old = F.col(field) if field in df.columns else F.lit(None)
    if cast_to is not None:
        old = old.try_cast(cast_to)
    return df.withColumn(field, F.when(c, new_val).otherwise(old))


def _require(opts: dict, *keys: str) -> None:
    for k in keys:
        if k not in opts:
            raise ValueError(f"processor option {k!r} is required")


# the special-purpose IPv4 registries network_direction accepts by
# name (the concrete, enumerable subset of ES's named ranges; "public"
# needs the full special-registry complement and refuses)
_NAMED_NETWORKS = {
    "private": ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"],
    "loopback": ["127.0.0.0/8"],
    "link_local": ["169.254.0.0/16"],
    "multicast": ["224.0.0.0/4"],
    "unspecified": ["0.0.0.0/32"],
    "broadcast": ["255.255.255.255/32"],
}


# octet-exact dotted-quad validity gate (the esql._IPV4_RE_SQL regex
# as a Python-side pattern) — rejects short quads ('1.2.3'),
# non-numeric octets, and out-of-range octets ('300.1.2.3') up front
_IPV4_RE = (
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}"
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)


def _ipv4_long(col: Column) -> Column:
    """Dotted-quad string → BIGINT (the aggs.ip_range_agg parse);
    NULL/malformed yields NULL — the module's failure contract.

    The regex gate + try_* accessors make that contract hold under
    Spark 4's default ANSI mode too (ADVICE r12): without them a
    short quad ('1.2.3') aborted the job with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT, a non-numeric octet threw on
    CAST, and an out-of-range octet ('300.1.2.3') silently
    misclassified instead of yielding NULL."""
    parts = F.split(col, r"\.")
    raw = (
        F.try_element_at(parts, F.lit(1)).try_cast("long") * F.lit(16777216)
        + F.try_element_at(parts, F.lit(2)).try_cast("long") * F.lit(65536)
        + F.try_element_at(parts, F.lit(3)).try_cast("long") * F.lit(256)
        + F.try_element_at(parts, F.lit(4)).try_cast("long")
    )
    return F.when(col.rlike(_IPV4_RE), raw)


def _cidr_lo_hi(block: str) -> tuple[int, int]:
    base, bits = block.split("/")
    a, b, c, d = (int(x) for x in base.split("."))
    if int(bits) > 32 or max(a, b, c, d) > 255:
        raise ValueError(f"invalid CIDR block: {block!r}")
    v = (a << 24) + (b << 16) + (c << 8) + d
    lo = v & (~((1 << (32 - int(bits))) - 1) & 0xFFFFFFFF)
    return lo, lo + (1 << (32 - int(bits)))


def _in_networks(ip_col: Column, networks: list[str]) -> Column:
    """Membership of an IPv4 column in named ranges / CIDR literals —
    pure integer range tests computed at compile time (engine-exact,
    the CIDR_MATCH contract); NULL ip → NULL."""
    blocks: list[str] = []
    for n in networks:
        if "/" in n:
            blocks.append(n)
        elif n in _NAMED_NETWORKS:
            blocks.extend(_NAMED_NETWORKS[n])
        else:
            raise ValueError(
                f"unsupported named network {n!r} — supported names: "
                f"{sorted(_NAMED_NETWORKS)} or CIDR literals "
                "(\"public\" needs the full special-registry "
                "complement; test the specific ranges instead)"
            )
    addr = _ipv4_long(ip_col)
    cond = F.lit(False)
    for blk in blocks:
        lo, hi = _cidr_lo_hi(blk)
        cond = cond | ((addr >= F.lit(lo)) & (addr < F.lit(hi)))
    return cond


def ingest_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Compile an ES ingest-pipeline processor list against ``df``.
    Each element is ``{"<type>": {options}}`` exactly as in the ES
    pipeline definition JSON; processors apply IN ORDER (a later
    processor sees every earlier mutation, including conditional
    ones — the ES execution contract)."""
    for proc in processors:
        if len(proc) != 1:
            raise ValueError(
                f"each processor is one {{type: options}} dict, got "
                f"keys {sorted(proc)}"
            )
        (ptype, opts), = proc.items()
        if ptype in _REFUSED:
            raise ValueError(
                f"unsupported ingest processor {ptype!r}: "
                f"{_REFUSED[ptype]}"
            )
        unknown = set(opts) - _PROC_OPTS.get(ptype, set()) - _COMMON_OPTS
        if ptype in _PROC_OPTS and unknown:
            raise ValueError(
                f"{ptype}: unrecognized option(s) {sorted(unknown)} — "
                f"supported: {sorted(_PROC_OPTS[ptype] | _COMMON_OPTS)} "
                "(on_failure handler lists are not supported; "
                "NULL-on-failure is the engine's failure contract)"
            )
        cond = opts.get("if")

        if ptype == "set":
            _require(opts, "field")
            if "copy_from" in opts:
                val = F.col(opts["copy_from"])
            elif "value" in opts:
                val = F.lit(opts["value"])
            else:
                raise ValueError("set needs `value` or `copy_from`")
            field = opts["field"]
            if not opts.get("override", True) and field in df.columns:
                val = F.coalesce(F.col(field), val)
            df = _apply_conditional(df, field, val, cond)

        elif ptype in ("rename", "remove"):
            _require(opts, "field")
            if cond is not None:
                raise ValueError(
                    f"{ptype} is schema-level in a columnar engine "
                    "and cannot apply per-row — drop the `if` or "
                    "model it as a conditional set + remove"
                )
            if opts["field"] not in df.columns:
                # Spark's drop/withColumnRenamed silently ignore a
                # missing column; ES fails the document — refuse
                # loudly unless ignore_missing (the ES option) is set
                if opts.get("ignore_missing", False):
                    continue
                raise ValueError(
                    f"{ptype}: field {opts['field']!r} does not exist "
                    "(pass ignore_missing=True for ES's lenient mode)"
                )
            if ptype == "remove":
                df = df.drop(opts["field"])
            else:
                _require(opts, "target_field")
                if opts["target_field"] in df.columns:
                    raise ValueError(
                        f"rename target {opts['target_field']!r} "
                        "already exists (ES fails the document too)"
                    )
                df = df.withColumnRenamed(
                    opts["field"], opts["target_field"]
                )

        elif ptype == "convert":
            _require(opts, "field", "type")
            t = _CONVERT_TYPES.get(opts["type"])
            if t is None:
                raise ValueError(
                    f"convert type must be one of "
                    f"{sorted(_CONVERT_TYPES)}, got {opts['type']!r}"
                )
            tgt = opts.get("target_field", opts["field"])
            df = _apply_conditional(
                df, tgt, F.col(opts["field"]).try_cast(t), cond,
                cast_to=t,
            )

        elif ptype == "gsub":
            _require(opts, "field", "pattern", "replacement")
            tgt = opts.get("target_field", opts["field"])
            df = _apply_conditional(
                df,
                tgt,
                F.regexp_replace(
                    F.col(opts["field"]),
                    opts["pattern"],
                    opts["replacement"],
                ),
                cond,
            )

        elif ptype in ("lowercase", "uppercase", "trim"):
            _require(opts, "field")
            fn = {"lowercase": F.lower, "uppercase": F.upper,
                  "trim": F.trim}[ptype]
            tgt = opts.get("target_field", opts["field"])
            df = _apply_conditional(df, tgt, fn(F.col(opts["field"])), cond)

        elif ptype in ("split", "join"):
            _require(opts, "field", "separator")
            tgt = opts.get("target_field", opts["field"])
            # split string→array / join array→string CHANGE the column
            # type; under a per-row `if` the keep-old CASE branch would
            # carry the source type and fail analysis with an opaque
            # DATATYPE_MISMATCH (and unlike convert there is no lossless
            # try_cast between string and array) — refuse with guidance
            # (self-review r11 pass 2)
            if cond is not None and tgt == opts["field"]:
                raise ValueError(
                    f"{ptype} with `if` changes the column's type and "
                    "cannot apply in place per row (one column, one "
                    "type) — write to a distinct target_field"
                )
            if ptype == "split":
                # the separator is a REGEX — ES documents it as one,
                # and Spark's split takes the same Java dialect
                val = F.split(F.col(opts["field"]), opts["separator"])
            else:
                val = F.array_join(F.col(opts["field"]), opts["separator"])
            df = _apply_conditional(df, tgt, val, cond)

        elif ptype == "append":
            _require(opts, "field", "value")
            field = opts["field"]
            vals = opts["value"]
            if not isinstance(vals, list):
                vals = [vals]
            add = F.array(*[F.lit(v) for v in vals])
            scalar_base = None
            if field not in df.columns:
                base = F.array()
            else:
                from pyspark.sql.types import ArrayType

                if isinstance(df.schema[field].dataType, ArrayType):
                    base = F.coalesce(F.col(field), F.array())
                else:
                    # ES coerces a scalar field to a one-element
                    # array before appending (self-review r10 — a
                    # bare concat(scalar, array) fails analysis);
                    # a NULL scalar counts as missing, not [NULL]
                    base = F.when(
                        F.col(field).isNull(), F.array()
                    ).otherwise(F.array(F.col(field)))
                    # under a per-row `if`, condition-false rows keep
                    # their value but the COLUMN must still become an
                    # array type (one column, one type — the coerced
                    # scalar, null-preserving); _apply_conditional's
                    # otherwise(F.col(field)) would mix array/scalar
                    # branches and fail analysis (self-review r10 #2)
                    scalar_base = F.when(
                        F.col(field).isNull(), F.lit(None)
                    ).otherwise(F.array(F.col(field)))
            if cond is not None and scalar_base is not None:
                c = F.coalesce(F.expr(cond), F.lit(False))
                df = df.withColumn(
                    field,
                    F.when(c, F.concat(base, add)).otherwise(scalar_base),
                )
            else:
                df = _apply_conditional(
                    df, field, F.concat(base, add), cond
                )

        elif ptype == "date":
            _require(opts, "field", "formats")
            tgt = opts.get("target_field", "@timestamp")
            tries = [
                F.try_to_timestamp(F.col(opts["field"]))
                if fmt in ("ISO8601", "iso8601")
                else F.try_to_timestamp(F.col(opts["field"]), F.lit(fmt))
                for fmt in opts["formats"]
            ]
            df = _apply_conditional(
                df, tgt, F.coalesce(*tries), cond, cast_to="timestamp"
            )

        elif ptype == "fingerprint":
            _require(opts, "fields")
            tgt = opts.get("target_field", "fingerprint")
            method = opts.get("method", "MD5").upper().replace("-", "")
            # documented contract (ES's exact byte layout is an
            # internal salt+separator scheme): names and stringified
            # values, field-name order, '|'-joined, then hashed
            parts: list[Column] = []
            for f in opts["fields"]:
                parts += [F.lit(f), F.col(f).cast("string")]
            joined = F.concat_ws("|", *parts)
            if method == "MD5":
                h = F.md5(joined)
            elif method == "SHA1":
                h = F.sha1(joined)
            elif method in ("SHA256", "SHA2"):
                h = F.sha2(joined, 256)
            else:
                raise ValueError(
                    f"fingerprint method must be MD5/SHA-1/SHA-256, "
                    f"got {opts.get('method')!r}"
                )
            df = _apply_conditional(df, tgt, h, cond)

        elif ptype == "grok":
            from monstache_spark.operators.esql import _grok_compile

            _require(opts, "field", "patterns")
            pats = opts["patterns"]
            if not isinstance(pats, list) or len(pats) != 1:
                raise ValueError(
                    "grok supports exactly ONE pattern here — ES's "
                    "try-in-order list would set a different FIELD SET "
                    "per row, which has no columnar schema"
                )
            rx, fields = _grok_compile(pats[0])
            # extract from a preserved source COPY — a field that
            # shares the source column's name would otherwise
            # truncate it on the first withColumn and corrupt every
            # later extraction (self-review r10; same contract as
            # the esql GROK/DISSECT commands)
            src_col = "_ingest_grok_src"
            df = df.withColumn(src_col, F.col(opts["field"]))
            src = F.col(src_col)
            matched = src.rlike(rx)
            for i, (fname, ftype) in enumerate(fields, start=1):
                piece = F.when(matched, F.regexp_extract(src, rx, i))
                if ftype in ("int", "long"):
                    piece = piece.cast("bigint")
                elif ftype in ("float", "double"):
                    piece = piece.cast("double")
                df = _apply_conditional(df, fname, piece, cond)
            df = df.drop(src_col)

        elif ptype == "dissect":
            from monstache_spark.operators.esql import _dissect_regex

            _require(opts, "field", "pattern")
            rx, keys = _dissect_regex(opts["pattern"])
            src_col = "_ingest_dissect_src"
            df = df.withColumn(src_col, F.col(opts["field"]))
            src = F.col(src_col)
            for i, key in enumerate(keys, start=1):
                piece = F.when(src.rlike(rx), F.regexp_extract(src, rx, i))
                df = _apply_conditional(df, key, piece, cond)
            df = df.drop(src_col)

        elif ptype == "csv":
            _require(opts, "field", "target_fields")
            sep = opts.get("separator", ",")
            if len(sep) != 1:
                raise ValueError("csv separator must be one character")
            if opts.get("quote"):
                raise ValueError(
                    "csv quote handling is not supported — the "
                    "processor splits on the bare separator (strip "
                    "quotes upstream or use gsub first)"
                )
            import re as _re

            parts = F.split(F.col(opts["field"]), _re.escape(sep))
            for i, tgt in enumerate(opts["target_fields"], start=1):
                val = F.try_element_at(parts, F.lit(i))
                if opts.get("trim", False):
                    val = F.trim(val)
                df = _apply_conditional(df, tgt, val, cond)

        elif ptype == "urldecode":
            _require(opts, "field")
            tgt = opts.get("target_field", opts["field"])
            # try_url_decode: a malformed %-escape yields NULL (the
            # convert/date failure contract) instead of failing the run
            df = _apply_conditional(
                df, tgt, F.try_url_decode(F.col(opts["field"])), cond
            )

        elif ptype == "html_strip":
            _require(opts, "field")
            tgt = opts.get("target_field", opts["field"])
            # tag removal only; HTML ENTITY decoding (&amp; etc.) is
            # a lookup table ES delegates to Lucene — compose a gsub
            # chain for the entities you need
            df = _apply_conditional(
                df, tgt,
                F.regexp_replace(F.col(opts["field"]), "<[^>]*>", ""),
                cond,
            )

        elif ptype == "bytes":
            _require(opts, "field")
            tgt = opts.get("target_field", opts["field"])
            src = F.lower(F.trim(F.col(opts["field"])))
            # ONE full-string regex: a bare number is bytes (ES
            # accepts "123" = 123 b); a string that is not exactly
            # number[+unit] ("12xb") yields NULL — the convert/date
            # failure contract, where a partial-prefix parse would
            # silently accept garbage
            rx = r"^([0-9]+(?:\.[0-9]+)?)\s*([kmgtp]?b)?$"
            matched = src.rlike(rx)
            num = F.when(matched, F.regexp_extract(src, rx, 1)) \
                .try_cast("double")
            unit = F.regexp_extract(src, rx, 2)
            factor = (
                F.when(unit == "", F.lit(1))
                .when(unit == "b", F.lit(1))
                .when(unit == "kb", F.lit(1024))
                .when(unit == "mb", F.lit(1024 ** 2))
                .when(unit == "gb", F.lit(1024 ** 3))
                .when(unit == "tb", F.lit(1024 ** 4))
                .when(unit == "pb", F.lit(1024 ** 5))
            )
            df = _apply_conditional(
                df, tgt, F.floor(num * factor).cast("bigint"), cond
            )

        elif ptype == "uri_parts":
            _require(opts, "field")
            tf = opts.get("target_field", "url")
            src = F.col(opts["field"])
            # one portable regex (no lookaround): scheme://[user@]
            # host[:port][path][?query][#fragment]; ES nests these
            # under an object field — a columnar schema flattens to
            # <target>_<part> columns; non-URIs yield NULL parts
            # RFC-3986 schemes are case-insensitive (ES parses
            # HTTPS:// fine) — match both cases, no (?i) so the
            # captured text stays exactly as written
            rx = (
                r"^([a-zA-Z][a-zA-Z0-9+.-]*)://(?:([^@/?#]+)@)?"
                r"([^:/?#]*)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?"
                r"(?:#(.*))?$"
            )
            matched = src.rlike(rx)
            parts = [
                ("scheme", 1, "string"), ("user_info", 2, "string"),
                ("domain", 3, "string"), ("port", 4, "bigint"),
                ("path", 5, "string"), ("query", 6, "string"),
                ("fragment", 7, "string"),
            ]
            for pname, gi, typ in parts:
                c = F.when(matched, F.regexp_extract(src, rx, gi))
                c = F.when(c == "", F.lit(None)).otherwise(c)
                if typ != "string":
                    c = c.cast(typ)
                df = _apply_conditional(df, f"{tf}_{pname}", c, cond)
            ext = F.when(
                matched,
                F.regexp_extract(
                    F.regexp_extract(src, rx, 5), r"\.([^./]+)$", 1
                ),
            )
            ext = F.when(ext == "", F.lit(None)).otherwise(ext)
            df = _apply_conditional(df, f"{tf}_extension", ext, cond)
            # r14 (S34 re-scan): the two remaining ES uri_parts
            # options, both deterministic.  keep_original copies the
            # unparsed value to <tf>_original — ES defaults it TRUE
            # because it REMOVES nothing by default and nests parts
            # under an object; in this flattened rendering the source
            # column already persists, so the copy defaults FALSE
            # (documented divergence — opt in for the ES column).
            if opts.get("keep_original", False):
                df = _apply_conditional(df, f"{tf}_original", src, cond)
            # remove_if_successful clears the source where the URI
            # parsed (ES removes the field per document; NULL is the
            # columnar "absent", the module's standing rendering) —
            # non-URI rows keep their value, as in ES
            if opts.get("remove_if_successful", False):
                df = _apply_conditional(
                    df, opts["field"],
                    F.when(matched, F.lit(None).cast("string")).otherwise(src),
                    cond,
                )

        elif ptype == "sort":
            _require(opts, "field")
            order = opts.get("order", "asc")
            if order not in ("asc", "desc"):
                raise ValueError(f"sort order must be asc/desc: {order!r}")
            tgt = opts.get("target_field", opts["field"])
            # sort_array's desc puts NULL elements LAST (the
            # documented ordering); reverse(array_sort) would put
            # them first
            df = _apply_conditional(
                df, tgt,
                F.sort_array(F.col(opts["field"]), asc=(order == "asc")),
                cond,
            )

        elif ptype == "kv":
            _require(opts, "field", "field_split", "value_split",
                     "include_keys")
            fs, vs = opts["field_split"], opts["value_split"]
            # ES's kv without include_keys creates a DYNAMIC field
            # set per document — no columnar schema; the explicit
            # include_keys form is the deterministic subset
            prefix = opts.get("prefix", "")
            import re as _re

            # user-supplied split regexes may carry CAPTURING groups
            # (ES accepts them) — the value's group index shifts past
            # every group inside the leading field_split and the
            # value_split (self-review r10 pass 3)
            gidx = 1 + _re.compile(fs).groups + _re.compile(vs).groups
            for key in opts["include_keys"]:
                rx = (
                    f"(?:^|{fs}){_re.escape(key)}{vs}"
                    f"(.*?)(?:{fs}|$)"
                )
                src = F.col(opts["field"])
                c = F.when(src.rlike(rx), F.regexp_extract(src, rx, gidx))
                df = _apply_conditional(df, f"{prefix}{key}", c, cond)

        elif ptype == "foreach":
            _require(opts, "field", "processor")
            sub = opts["processor"]
            if len(sub) != 1:
                raise ValueError(
                    "foreach takes one {type: options} sub-processor"
                )
            (stype, sopts), = sub.items()
            # ES contract: the sub-processor addresses the current
            # element as `_ingest._value`
            if sopts.get("field") != "_ingest._value":
                raise ValueError(
                    "foreach sub-processor must target _ingest._value "
                    "(the ES element reference)"
                )
            if "if" in sopts:
                raise ValueError(
                    "a per-ELEMENT `if` has no ES equivalent — put "
                    "the condition on the foreach processor itself"
                )
            # element-wise transforms expressible as ONE lambda over
            # the array (F.transform — codegen, no explode); the
            # sub-processor set is the string/scalar core.  A
            # type-changing `convert` under a per-row `if` would mix
            # array element types across CASE branches — same refusal
            # class as in-place split/join.
            if stype == "convert":
                t = _CONVERT_TYPES.get(sopts.get("type"))
                if t is None:
                    raise ValueError(
                        f"convert type must be one of "
                        f"{sorted(_CONVERT_TYPES)}, got {sopts.get('type')!r}"
                    )
                if cond is not None:
                    raise ValueError(
                        "foreach+convert changes the element type and "
                        "cannot vary per row — drop the `if`"
                    )
                elem = lambda x: x.try_cast(t)  # noqa: E731
            elif stype in ("lowercase", "uppercase", "trim"):
                fn = {"lowercase": F.lower, "uppercase": F.upper,
                      "trim": F.trim}[stype]
                # explicit 1-arg lambda: F.transform probes the
                # callable's arity and a 2-arg-capable builtin
                # (F.trim(col, trimstr)) would be called as
                # (element, INDEX) — trimming the characters of "0",
                # not whitespace (self-review r11 pass 4)
                elem = lambda x: fn(x)  # noqa: E731
            elif stype == "gsub":
                if "pattern" not in sopts or "replacement" not in sopts:
                    raise ValueError("foreach gsub needs pattern/replacement")
                pat, rep = sopts["pattern"], sopts["replacement"]
                elem = lambda x: F.regexp_replace(x, pat, rep)  # noqa: E731
            elif stype == "urldecode":
                elem = F.try_url_decode
            else:
                raise ValueError(
                    f"unsupported foreach sub-processor {stype!r} — "
                    "supported: convert/lowercase/uppercase/trim/"
                    "gsub/urldecode (element-wise Column transforms; "
                    "schema-level or multi-field sub-processors have "
                    "no per-element form)"
                )
            field = opts["field"]
            if field not in df.columns:
                if opts.get("ignore_missing", False):
                    continue
                raise ValueError(
                    f"foreach: field {field!r} does not exist "
                    "(pass ignore_missing=True for ES's lenient mode)"
                )
            df = _apply_conditional(
                df, field, F.transform(F.col(field), elem), cond
            )

        elif ptype == "drop":
            _require(opts, "if")
            df = df.filter(~F.coalesce(F.expr(opts["if"]), F.lit(False)))

        elif ptype == "json":
            # ES json processor: parse a JSON string field.  Columnar
            # rendering: Spark 4 VARIANT (try_parse_json — malformed
            # JSON yields NULL, the failure contract); extract typed
            # values downstream with variant_get.  add_to_root is a
            # schema-changing per-row operation and refuses via the
            # option allowlist.  `if` routes through
            # _apply_conditional like every value-level processor
            # (ADVICE r12: it was silently ignored); condition-false
            # rows keep the old value — for a fresh target_field the
            # keep-old branch is NULL-typed and try_casts to VARIANT.
            _require(opts, "field")
            tgt = opts.get("target_field", opts["field"])
            df = _apply_conditional(
                df, tgt, F.try_parse_json(F.col(opts["field"])), cond,
                cast_to="variant",
            )

        elif ptype == "dot_expander":
            # "a.b.c" (a literal dotted column name) → nested struct
            # a.b.c.  Fields land via withField when the root struct
            # exists (override semantics, ES's default); override:
            # false has no cheap columnar rendering (needs per-row
            # nested-existence tests) and refuses.  Schema-level like
            # rename/remove, so a per-row `if` refuses loudly
            # (ADVICE r12: it was silently ignored).
            _require(opts, "field")
            if cond is not None:
                raise ValueError(
                    "dot_expander is schema-level in a columnar "
                    "engine and cannot apply per-row — drop the `if` "
                    "or model it as a conditional set + remove"
                )
            if not opts.get("override", True):
                raise ValueError(
                    "dot_expander override: false is not supported — "
                    "the columnar rendering always overrides (ES "
                    "default); restructure with set/copy_from first"
                )
            fld = opts["field"]
            if "." not in fld:
                raise ValueError(f"dot_expander field has no dot: {fld!r}")
            if fld not in df.columns:
                raise ValueError(f"dot_expander: no column {fld!r}")
            root, _, path = fld.partition(".")
            src = F.col("`" + fld + "`")
            if root in df.columns:
                base = df.schema[root].dataType
                if base.typeName() != "struct":
                    raise ValueError(
                        f"dot_expander: {root!r} exists and is not a "
                        "struct — rename it first"
                    )
                # withField creates only the LAST path segment; for a
                # multi-level path ('n.b.c' into existing root n) any
                # missing intermediate struct must be built first or
                # Spark fails with FIELD_NOT_FOUND (ADVICE r12 — ES
                # creates intermediate objects).  Walk down the
                # existing schema; wrap src in structs for the
                # missing tail, then withField at the deepest
                # EXISTING struct level.
                parts = path.split(".")
                dt = base
                depth = 0  # how many leading parts exist as structs
                for part in parts[:-1]:
                    names = {f.name: f.dataType for f in dt.fields}
                    if part in names and names[part].typeName() == "struct":
                        dt = names[part]
                        depth += 1
                    elif part in names:
                        # an intermediate that exists as a SCALAR
                        # would be silently replaced by withField
                        # (data loss) — refuse exactly like the
                        # root-level non-struct case (ADVICE r13)
                        raise ValueError(
                            "dot_expander: "
                            f"{'.'.join([root] + parts[:depth + 1])!r}"
                            " exists and is not a struct — rename it "
                            "first"
                        )
                    else:
                        break
                val = src
                for part in reversed(parts[depth:][1:] or []):
                    val = F.struct(val.alias(part))
                # alias of the field written at the withField level:
                # parts[depth] (the first missing / leaf segment)
                target_path = ".".join(
                    "`" + p + "`" for p in parts[: depth + 1]
                )
                val = F.col(root).withField(target_path, val)
            else:
                val = src
                for part in reversed(path.split(".")):
                    val = F.struct(val.alias(part))
            df = df.withColumn(root, val).drop(fld)

        elif ptype == "date_index_name":
            # Computes the rollover target index per document.  ES
            # emits an unresolved date-math expression
            # (<prefix{ts||/d{fmt}}>) that the index API resolves;
            # this engine emits the RESOLVED name directly into
            # `_index` (the routing column the sink ops consume) —
            # same destination index, no deferred resolution step.
            _require(opts, "field", "date_rounding")
            units = {"y": "year", "M": "month", "w": "week", "d": "day",
                     "h": "hour", "m": "minute", "s": "second"}
            r = opts["date_rounding"]
            if r not in units:
                raise ValueError(
                    f"date_rounding must be one of {sorted(units)}: {r!r}"
                )
            fmt = opts.get("index_name_format", "yyyy-MM-dd")
            name = F.concat(
                F.lit(opts.get("index_name_prefix", "")),
                F.date_format(F.date_trunc(units[r], F.col(opts["field"])), fmt),
            )
            df = _apply_conditional(df, "_index", name, cond)

        elif ptype == "reroute":
            # ES reroute processor: redirect the document to another
            # index / data stream.  `destination` sets `_index`
            # directly; otherwise the data-stream naming scheme
            # `<type>-<dataset>-<namespace>` composes it (ES keeps
            # the stream type — `type` defaults to "logs", the
            # documented reroute target family).  Every value is a
            # literal or a `{{field}}` mustache reference (ES's
            # field-templating form — a column read, one codegen
            # concat).  `_index` is the routing column the sink ops
            # consume, same destination contract as date_index_name.
            def _tmpl(v: str) -> Column:
                m = re.fullmatch(r"\{\{\s*([\w.]+)\s*\}\}", v)
                return F.col(m.group(1)) if m else F.lit(v)

            if "destination" in opts:
                if "dataset" in opts or "namespace" in opts:
                    raise ValueError(
                        "reroute takes destination OR dataset/"
                        "namespace, not both (the ES contract)"
                    )
                target = _tmpl(opts["destination"])
            else:
                if "dataset" not in opts and "namespace" not in opts:
                    raise ValueError(
                        "reroute needs destination or dataset/"
                        "namespace"
                    )
                # F.concat, not concat_ws: concat_ws SKIPS a NULL
                # mustache-resolved field and collapses the segment
                # ("logs-web" from a NULL namespace) — ES fails the
                # document on a missing field, and this module's
                # failure contract is NULL propagation, so a NULL
                # field must yield a NULL _index (ADVICE r13)
                target = F.concat(
                    _tmpl(opts.get("type", "logs")),
                    F.lit("-"),
                    _tmpl(opts.get("dataset", "generic")),
                    F.lit("-"),
                    _tmpl(opts.get("namespace", "default")),
                )
            df = _apply_conditional(df, "_index", target, cond)

        elif ptype == "network_direction":
            # inbound/outbound/internal/external from the two
            # endpoint IPs vs the internal-network set — compile-time
            # integer CIDR bounds (the CIDR_MATCH contract), one
            # codegen CASE.  NULL/malformed IPs yield NULL.
            _require(opts, "source_ip", "destination_ip",
                     "internal_networks")
            nets = opts["internal_networks"]
            if not isinstance(nets, list) or not nets:
                raise ValueError(
                    "internal_networks must be a non-empty list of "
                    "CIDR literals / named ranges"
                )
            src_in = _in_networks(F.col(opts["source_ip"]), nets)
            dst_in = _in_networks(F.col(opts["destination_ip"]), nets)
            direction = (
                F.when(src_in & dst_in, F.lit("internal"))
                .when(src_in & ~dst_in, F.lit("outbound"))
                .when(~src_in & dst_in, F.lit("inbound"))
                .when(~src_in & ~dst_in, F.lit("external"))
            )
            df = _apply_conditional(
                df, opts.get("target_field", "network.direction"),
                direction, cond,
            )

        elif ptype == "community_id":
            # Community ID v1 (the published Corelight flow-hash
            # spec): endpoints ordered so the smaller (address, then
            # port) comes first, then
            # sha1(seed·u16 | saddr | daddr | proto·u8 | 0·u8 |
            # sport·u16 | dport·u16) base64'd under a "1:" prefix.
            # Byte assembly is hex-string concat + unhex — one
            # codegen projection, IPv4 + port transports (tcp/udp/
            # sctp or an explicit iana_number column); ICMP's
            # type/code→pseudo-port mapping table is out of scope
            # (refused via the option allowlist).  Any NULL input →
            # NULL id (failure contract).
            _require(opts, "source_ip", "destination_ip",
                     "source_port", "destination_port")
            if "transport" in opts and "iana_number" in opts:
                raise ValueError(
                    "community_id takes transport OR iana_number"
                )
            if "iana_number" in opts:
                proto = F.col(opts["iana_number"]).cast("long")
            elif "transport" in opts:
                t = F.lower(F.col(opts["transport"]))
                proto = (
                    F.when(t == "tcp", F.lit(6))
                    .when(t == "udp", F.lit(17))
                    .when(t == "sctp", F.lit(132))
                    .cast("long")
                )
            else:
                raise ValueError(
                    "community_id needs transport or iana_number"
                )
            seed = int(opts.get("seed", 0))
            if not 0 <= seed <= 0xFFFF:
                raise ValueError(f"seed must be a u16: {seed}")
            sa = _ipv4_long(F.col(opts["source_ip"]))
            da = _ipv4_long(F.col(opts["destination_ip"]))
            sp = F.col(opts["source_port"]).cast("long")
            dp = F.col(opts["destination_port"]).cast("long")
            flip = (sa > da) | ((sa == da) & (sp > dp))
            a1 = F.when(flip, da).otherwise(sa)
            a2 = F.when(flip, sa).otherwise(da)
            p1 = F.when(flip, dp).otherwise(sp)
            p2 = F.when(flip, sp).otherwise(dp)

            def _hexn(c: Column, n: int) -> Column:
                return F.lpad(F.lower(F.hex(c)), n, "0")

            payload = F.concat(
                F.lit(format(seed, "04x")),
                _hexn(a1, 8), _hexn(a2, 8),
                _hexn(proto, 2), F.lit("00"),
                _hexn(p1, 4), _hexn(p2, 4),
            )
            cid = F.concat(
                F.lit("1:"), F.base64(F.unhex(F.sha1(F.unhex(payload))))
            )
            df = _apply_conditional(
                df, opts.get("target_field", "network.community_id"),
                cid, cond,
            )

        else:
            raise ValueError(f"unknown ingest processor: {ptype!r}")
    return df
