"""ES ingest-pipeline simulation (operators/ingest.py): processor
order, per-row `if` gating, schema-level refusals, failure-as-null
conversions, and the refused processor set."""

from __future__ import annotations

import pytest

from monstache_spark.operators.ingest import ingest_pipeline


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alice", "INFO n=42", "7", 100.0),
            (2, "bob", "garbage", "x", 500.0),
            (3, None, "WARN n=9", "3", None),
        ],
        "id long, name string, line string, nstr string, v double",
    )


def test_set_copy_override_and_rename_remove(docs):
    out = ingest_pipeline(
        docs,
        [
            {"set": {"field": "src", "value": "t"}},
            {"set": {"field": "name", "value": "anon", "override": False}},
            {"set": {"field": "name2", "copy_from": "name"}},
            {"rename": {"field": "line", "target_field": "msg"}},
            {"remove": {"field": "v"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["src"] == "t" and rows[1]["name"] == "alice"
    assert rows[3]["name"] == "anon"          # override=False fills null
    assert rows[1]["name2"] == "alice"
    assert "msg" in out.columns and "line" not in out.columns
    assert "v" not in out.columns
    with pytest.raises(ValueError, match="already exists"):
        ingest_pipeline(docs, [{"rename": {"field": "id", "target_field": "name"}}])
    with pytest.raises(ValueError, match="schema-level"):
        ingest_pipeline(docs, [{"remove": {"field": "v", "if": "id > 1"}}])


def test_convert_null_on_failure_and_conditional(docs):
    out = ingest_pipeline(
        docs,
        [
            {"convert": {"field": "nstr", "type": "long",
                         "target_field": "n"}},
            {"uppercase": {"field": "name", "if": "v > 200"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["n"] == 7 and rows[2]["n"] is None
    assert rows[1]["name"] == "alice"      # condition false: untouched
    assert rows[2]["name"] == "BOB"        # condition true
    assert rows[3]["name"] is None         # null condition: untouched


def test_processor_order_is_visible_downstream(docs):
    """A later processor sees earlier mutations — uppercase THEN drop
    means rows uppercased first escape a lowercase-literal drop."""
    out = ingest_pipeline(
        docs,
        [
            {"uppercase": {"field": "name", "if": "id = 2"}},
            {"drop": {"if": "name = 'bob'"}},
        ],
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3]
    out2 = ingest_pipeline(
        docs, [{"drop": {"if": "name = 'bob'"}}]
    )
    assert sorted(r["id"] for r in out2.collect()) == [1, 3]


def test_split_join_append_gsub(docs):
    out = ingest_pipeline(
        docs,
        [
            {"split": {"field": "line", "separator": "\\s+",
                       "target_field": "toks"}},
            {"join": {"field": "toks", "separator": "|",
                      "target_field": "piped"}},
            {"append": {"field": "toks", "value": "EOL"}},
            {"gsub": {"field": "nstr", "pattern": "[0-9]",
                      "replacement": "#"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["piped"] == "INFO|n=42"
    assert rows[1]["toks"] == ["INFO", "n=42", "EOL"]
    assert rows[1]["nstr"] == "#" and rows[2]["nstr"] == "x"


def test_date_first_matching_format(spark):
    df = spark.createDataFrame(
        [("2024-03-15",), ("15/03/2024",), ("nope",)], "d string"
    )
    out = ingest_pipeline(
        df,
        [{"date": {"field": "d",
                   "formats": ["yyyy-MM-dd", "dd/MM/yyyy"],
                   "target_field": "ts"}}],
    ).collect()
    import datetime as dt

    assert out[0]["ts"] == dt.datetime(2024, 3, 15)
    assert out[1]["ts"] == dt.datetime(2024, 3, 15)
    assert out[2]["ts"] is None


def test_fingerprint_grok_dissect(docs):
    out = ingest_pipeline(
        docs,
        [
            {"fingerprint": {"fields": ["id", "name"],
                             "target_field": "fp"}},
            {"grok": {"field": "line",
                      "patterns": ["%{LOGLEVEL:lvl} n=%{INT:n:int}"]}},
            {"dissect": {"field": "line", "pattern": "%{head} %{rest}"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    import hashlib

    assert rows[1]["fp"] == hashlib.md5(b"id|1|name|alice").hexdigest()
    assert rows[1]["lvl"] == "INFO" and rows[1]["n"] == 42
    assert rows[2]["lvl"] is None and rows[2]["n"] is None
    assert rows[1]["head"] == "INFO" and rows[1]["rest"] == "n=42"
    with pytest.raises(ValueError, match="exactly ONE pattern"):
        ingest_pipeline(
            docs, [{"grok": {"field": "line",
                             "patterns": ["%{WORD:a}", "%{INT:b}"]}}]
        )


def test_refused_processors(docs):
    for p in ("script", "geoip", "user_agent", "enrich", "pipeline"):
        with pytest.raises(ValueError, match="unsupported ingest"):
            ingest_pipeline(docs, [{p: {}}])
    with pytest.raises(ValueError, match="unknown ingest"):
        ingest_pipeline(docs, [{"nope": {}}])
    with pytest.raises(ValueError, match="one .*type: options"):
        ingest_pipeline(docs, [{"set": {}, "drop": {}}])


def test_csv_urldecode_htmlstrip_bytes(spark):
    df = spark.createDataFrame(
        [
            (1, "a,b,c", "x%20y%2F", "<b>hi</b> there<br/>", "10kb"),
            (2, "only", "%zz", "plain", "1.5mb"),
            (3, None, None, None, "nope"),
        ],
        "id long, row string, enc string, html string, sz string",
    )
    out = ingest_pipeline(
        df,
        [
            {"csv": {"field": "row", "target_fields": ["c1", "c2"],
                     "trim": True}},
            {"urldecode": {"field": "enc"}},
            {"html_strip": {"field": "html"}},
            {"bytes": {"field": "sz", "target_field": "nbytes"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[1]["c1"], rows[1]["c2"]) == ("a", "b")
    assert (rows[2]["c1"], rows[2]["c2"]) == ("only", None)
    assert rows[1]["enc"] == "x y/"
    assert rows[2]["enc"] is None          # malformed %-escape -> null
    assert rows[1]["html"] == "hi there"
    assert rows[1]["nbytes"] == 10240
    assert rows[2]["nbytes"] == 1572864
    assert rows[3]["nbytes"] is None
    with pytest.raises(ValueError, match="quote handling"):
        ingest_pipeline(df, [{"csv": {"field": "row",
                                      "target_fields": ["a"],
                                      "quote": '"'}}])
    with pytest.raises(ValueError, match="one character"):
        ingest_pipeline(df, [{"csv": {"field": "row",
                                      "target_fields": ["a"],
                                      "separator": ", "}}])


def test_grok_field_shadowing_source(spark):
    """Self-review r10: grok/dissect extract from a preserved source
    copy — a field named like the source column must not corrupt
    later captures."""
    df = spark.createDataFrame([("a 7",)], "line string")
    out = ingest_pipeline(
        df, [{"grok": {"field": "line",
                       "patterns": ["%{WORD:line} %{INT:n:int}"]}}]
    ).collect()[0]
    assert out["line"] == "a" and out["n"] == 7
    out = ingest_pipeline(
        df, [{"dissect": {"field": "line", "pattern": "%{line} %{n}"}}]
    ).collect()[0]
    assert out["line"] == "a" and out["n"] == "7"


def test_rename_remove_missing_field(docs):
    """Self-review r10: Spark silently ignores a missing column on
    drop/rename; ES fails the document — refuse loudly, with ES's
    ignore_missing opt-out."""
    with pytest.raises(ValueError, match="does not exist"):
        ingest_pipeline(docs, [{"rename": {"field": "typo",
                                           "target_field": "msg"}}])
    with pytest.raises(ValueError, match="does not exist"):
        ingest_pipeline(docs, [{"remove": {"field": "typo"}}])
    out = ingest_pipeline(
        docs, [{"remove": {"field": "typo", "ignore_missing": True}}]
    )
    assert out.columns == docs.columns


def test_append_coerces_scalar(spark):
    """Self-review r10: append on a scalar field coerces it to a
    one-element array (ES semantics); a NULL scalar counts as
    missing, not [NULL]."""
    df = spark.createDataFrame([(1, "old"), (2, None)],
                               "id long, tag string")
    out = ingest_pipeline(
        df, [{"append": {"field": "tag", "value": "new"}}]
    )
    rows = {r["id"]: r["tag"] for r in out.collect()}
    assert rows[1] == ["old", "new"]
    assert rows[2] == ["new"]


def test_ingest_pipeline_is_streaming_legal(spark, tmp_path):
    """The whole processor chain is stateless (projection + filter),
    so it applies unchanged to a STREAMING frame — the shape a
    change-stream ingest stage runs in production."""
    src = spark.createDataFrame(
        [(1, "alice", "10kb"), (2, "bob", "2kb")],
        "id long, name string, sz string",
    )
    d = str(tmp_path / "in")
    src.write.parquet(d)
    stream = spark.readStream.schema(src.schema).parquet(d)
    out = ingest_pipeline(
        stream,
        [
            {"uppercase": {"field": "name"}},
            {"bytes": {"field": "sz", "target_field": "nb"}},
            {"drop": {"if": "nb < 5000"}},
        ],
    )
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("ingest_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM ingest_stream").collect()
    assert [(r["id"], r["name"], r["nb"]) for r in rows] == \
        [(1, "ALICE", 10240)]


def test_uri_parts_sort_kv(spark):
    df = spark.createDataFrame(
        [
            (1, "https://user@example.com:8443/a/b.html?q=1#frag",
             [3, 1, 2], "k1=a k2=b extra"),
            (2, "http://plain.org/path", [9], "k2=only"),
            (3, "not a uri", None, "nothing here"),
        ],
        "id long, u string, arr array<int>, line string",
    )
    out = ingest_pipeline(
        df,
        [
            {"uri_parts": {"field": "u"}},
            {"sort": {"field": "arr", "order": "desc"}},
            {"kv": {"field": "line", "field_split": "\\s+",
                    "value_split": "=", "include_keys": ["k1", "k2"],
                    "prefix": "kv_"}},
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    r1 = rows[1]
    assert (r1["url_scheme"], r1["url_user_info"], r1["url_domain"],
            r1["url_port"]) == ("https", "user", "example.com", 8443)
    assert (r1["url_path"], r1["url_query"], r1["url_fragment"],
            r1["url_extension"]) == ("/a/b.html", "q=1", "frag", "html")
    r2 = rows[2]
    assert (r2["url_scheme"], r2["url_port"], r2["url_query"]) == \
        ("http", None, None)
    assert rows[3]["url_scheme"] is None
    assert r1["arr"] == [3, 2, 1] and rows[2]["arr"] == [9]
    assert (r1["kv_k1"], r1["kv_k2"]) == ("a", "b")
    assert (r2["kv_k1"], r2["kv_k2"]) == (None, "only")
    assert rows[3]["kv_k1"] is None
    with pytest.raises(ValueError, match="asc/desc"):
        ingest_pipeline(df, [{"sort": {"field": "arr", "order": "up"}}])


def test_conditional_convert_keeps_target_type(docs):
    """Round-11 ADVICE: a per-row `if` on a type-changing processor
    must not coerce the CASE branches back to the source type — the
    keep-old branch is try_cast to the target, so the column type
    matches the unconditional form (a condition-false value the type
    can't represent becomes NULL, the documented failure shape)."""
    out = ingest_pipeline(
        docs,
        [{"convert": {"field": "nstr", "type": "long",
                      "target_field": "n", "if": "v > 200"}}],
    )
    assert dict(out.dtypes)["n"] == "bigint"
    rows = {r["id"]: r for r in out.collect()}
    assert rows[2]["n"] is None            # cond true, 'x' unparseable
    assert rows[1]["n"] is None            # cond false, no prior target
    # in-place conditional convert: condition-false rows' values go
    # through the same try_cast representation change
    out2 = ingest_pipeline(
        docs,
        [{"convert": {"field": "nstr", "type": "long", "if": "v > 200"}}],
    )
    assert dict(out2.dtypes)["nstr"] == "bigint"
    rows2 = {r["id"]: r for r in out2.collect()}
    assert rows2[1]["nstr"] == 7           # cond false: old value, cast
    assert rows2[2]["nstr"] is None
    # conditional date: target column is TIMESTAMP in both branches
    out3 = ingest_pipeline(
        docs,
        [{"set": {"field": "d", "value": "2024-01-02 03:04:05"}},
         {"date": {"field": "d", "formats": ["ISO8601"],
                   "target_field": "@timestamp", "if": "v > 200"}}],
    )
    assert dict(out3.dtypes)["@timestamp"] == "timestamp"


def test_bytes_bare_number_and_garbage(spark):
    """Round-11 ADVICE: ES's bytes processor accepts a unit-less
    number as bytes; a partial parse ("12xb") must NOT silently strip
    the garbage — it yields NULL like any unparseable input."""
    df = spark.createDataFrame(
        [(1, "123"), (2, "12xb"), (3, " 2.5 kb "), (4, "1b")],
        "id long, sz string",
    )
    out = ingest_pipeline(df, [{"bytes": {"field": "sz"}}])
    rows = {r["id"]: r["sz"] for r in out.collect()}
    assert rows[1] == 123
    assert rows[2] is None
    assert rows[3] == 2560
    assert rows[4] == 1


def test_unknown_processor_options_refuse(docs):
    """Round-11 ADVICE: unrecognized options refuse loudly (the typo'd
    ignore_missing class); ES-common metadata options pass through."""
    with pytest.raises(ValueError, match="unrecognized option"):
        ingest_pipeline(docs, [{"convert": {"field": "nstr",
                                            "type": "long",
                                            "ignore_missing": True}}])
    with pytest.raises(ValueError, match="unrecognized option"):
        ingest_pipeline(docs, [{"set": {"field": "x", "value": 1,
                                        "on_failure": []}}])
    out = ingest_pipeline(
        docs,
        [{"set": {"field": "x", "value": 1, "tag": "t1",
                  "description": "d", "ignore_failure": True}}],
    )
    assert out.collect()[0]["x"] == 1


def test_conditional_split_join_in_place_refuse(spark):
    """Self-review r11 pass 2: split/join under a per-row `if` change
    the column type — in place they would die with an opaque Spark
    DATATYPE_MISMATCH; now they refuse with guidance, and a distinct
    target_field works."""
    df = spark.createDataFrame(
        [(1, "a b", 300.0), (2, "c d", 100.0)], "id long, s string, v double"
    )
    with pytest.raises(ValueError, match="distinct target_field"):
        ingest_pipeline(df, [{"split": {"field": "s", "separator": " ",
                                        "if": "v > 200"}}])
    with pytest.raises(ValueError, match="distinct target_field"):
        ingest_pipeline(df, [{"join": {"field": "s", "separator": "-",
                                       "if": "v > 200"}}])
    out = ingest_pipeline(
        df, [{"split": {"field": "s", "separator": " ",
                        "target_field": "parts", "if": "v > 200"}}]
    )
    rows = {r["id"]: r["parts"] for r in out.collect()}
    assert rows[1] == ["a", "b"] and rows[2] is None


def test_foreach_element_transforms(spark):
    """foreach: element-wise sub-processors through the
    _ingest._value contract — one F.transform per step, per-row `if`
    gates the whole array, convert+if refuses (element-type change
    cannot vary per row), unsupported sub-processors and wrong
    element references refuse loudly, ignore_missing honored."""
    df = spark.createDataFrame(
        [(1, ["a ", "Bo"], ["7", "x"], 300.0),
         (2, ["c"], ["1", "2"], 100.0),
         (3, None, None, None)],
        "id long, tags array<string>, nums array<string>, v double",
    )
    out = ingest_pipeline(df, [
        {"foreach": {"field": "tags",
                     "processor": {"trim": {"field": "_ingest._value"}}}},
        {"foreach": {"field": "tags",
                     "processor": {"uppercase": {"field": "_ingest._value"}},
                     "if": "v > 200"}},
        {"foreach": {"field": "nums",
                     "processor": {"convert": {"field": "_ingest._value",
                                               "type": "long"}}}},
    ])
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["tags"] == ["A", "BO"]          # trimmed then shouted
    assert rows[2]["tags"] == ["c"]                # cond false: trimmed only
    assert rows[3]["tags"] is None                 # null array stays null
    assert rows[1]["nums"] == [7, None]            # unparseable -> NULL elem
    assert dict(out.dtypes)["nums"] == "array<bigint>"
    with pytest.raises(ValueError, match="_ingest._value"):
        ingest_pipeline(df, [{"foreach": {
            "field": "tags", "processor": {"trim": {"field": "tags"}}}}])
    with pytest.raises(ValueError, match="cannot vary per row"):
        ingest_pipeline(df, [{"foreach": {
            "field": "nums", "if": "v > 200",
            "processor": {"convert": {"field": "_ingest._value",
                                      "type": "long"}}}}])
    with pytest.raises(ValueError, match="unsupported foreach sub"):
        ingest_pipeline(df, [{"foreach": {
            "field": "tags",
            "processor": {"rename": {"field": "_ingest._value",
                                     "target_field": "z"}}}}])
    with pytest.raises(ValueError, match="does not exist"):
        ingest_pipeline(df, [{"foreach": {
            "field": "nope",
            "processor": {"trim": {"field": "_ingest._value"}}}}])
    out2 = ingest_pipeline(df, [{"foreach": {
        "field": "nope", "ignore_missing": True,
        "processor": {"trim": {"field": "_ingest._value"}}}}])
    assert out2.columns == df.columns


def test_network_direction(spark):
    df = spark.createDataFrame(
        [
            (1, "10.1.2.3", "10.9.9.9"),        # internal/internal
            (2, "10.1.2.3", "8.8.8.8"),         # outbound
            (3, "8.8.8.8", "192.168.1.5"),      # inbound
            (4, "8.8.8.8", "1.1.1.1"),          # external
            (5, None, "10.0.0.1"),              # null ip -> null
            (6, "172.16.0.1", "172.31.255.254"),  # /12 edge inside
            (7, "172.32.0.1", "10.0.0.1"),      # past the /12 -> inbound
        ],
        "id long, sip string, dip string",
    )
    out = ingest_pipeline(df, [{"network_direction": {
        "source_ip": "sip", "destination_ip": "dip",
        "internal_networks": ["private"],
        "target_field": "dir",
    }}]).collect()
    got = {r["id"]: r["dir"] for r in out}
    assert got == {1: "internal", 2: "outbound", 3: "inbound",
                   4: "external", 5: None, 6: "internal", 7: "inbound"}
    with pytest.raises(ValueError, match="unsupported named network"):
        ingest_pipeline(df, [{"network_direction": {
            "source_ip": "sip", "destination_ip": "dip",
            "internal_networks": ["public"],
        }}])


def test_community_id_matches_independent_python(spark):
    """The Spark community_id column must equal an INDEPENDENT pure-
    Python rendering of the published v1 spec (hashlib + struct —
    a third implementation, not shared code)."""
    import base64 as b64
    import hashlib
    import struct as st

    rows = [
        (1, "66.35.250.204", "128.232.110.120", 80, 34855, "tcp"),
        (2, "128.232.110.120", "66.35.250.204", 34855, 80, "tcp"),  # flipped = same id
        (3, "10.0.0.1", "10.0.0.2", 53, 5353, "udp"),
        (4, "10.0.0.1", "10.0.0.1", 9, 7, "sctp"),  # same addr: port orders
        (5, "10.0.0.1", "10.0.0.2", 1, 2, "icmp"),  # unsupported -> null
    ]
    df = spark.createDataFrame(
        rows, "id long, sip string, dip string, sp long, dp long, tr string"
    )
    out = ingest_pipeline(df, [{"community_id": {
        "source_ip": "sip", "destination_ip": "dip",
        "source_port": "sp", "destination_port": "dp",
        "transport": "tr", "target_field": "cid",
    }}]).collect()
    got = {r["id"]: r["cid"] for r in out}

    def expect(sip, dip, sp, dp, proto, seed=0):
        import socket
        sa, da = socket.inet_aton(sip), socket.inet_aton(dip)
        if sa > da or (sa == da and sp > dp):
            sa, da, sp, dp = da, sa, dp, sp
        payload = st.pack("!H", seed) + sa + da + st.pack("!BBHH", proto, 0, sp, dp)
        return "1:" + b64.b64encode(hashlib.sha1(payload).digest()).decode()

    assert got[1] == expect("66.35.250.204", "128.232.110.120", 80, 34855, 6)
    assert got[2] == got[1]  # direction-independent
    assert got[3] == expect("10.0.0.1", "10.0.0.2", 53, 5353, 17)
    assert got[4] == expect("10.0.0.1", "10.0.0.1", 9, 7, 132)
    assert got[5] is None
    # seed changes the id
    out2 = ingest_pipeline(df.filter("id = 1"), [{"community_id": {
        "source_ip": "sip", "destination_ip": "dip",
        "source_port": "sp", "destination_port": "dp",
        "transport": "tr", "seed": 1, "target_field": "cid",
    }}]).collect()
    assert out2[0]["cid"] == expect("66.35.250.204", "128.232.110.120", 80, 34855, 6, seed=1)
    assert out2[0]["cid"] != got[1]
    with pytest.raises(ValueError, match="transport OR iana_number"):
        ingest_pipeline(df, [{"community_id": {
            "source_ip": "sip", "destination_ip": "dip",
            "source_port": "sp", "destination_port": "dp",
            "transport": "tr", "iana_number": "sp",
        }}])


def test_json_dot_expander_date_index_name(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}',
          datetime.datetime(2024, 3, 17, 10, 44), 5),
         (2, "not json",
          datetime.datetime(2024, 12, 31, 23, 59, 59), 6)],
        "id long, payload string, ts timestamp, `geo.score` long",
    )
    out = ingest_pipeline(df, [
        {"json": {"field": "payload", "target_field": "doc"}},
        {"dot_expander": {"field": "geo.score"}},
        {"date_index_name": {
            "field": "ts", "index_name_prefix": "logs-",
            "date_rounding": "M", "index_name_format": "yyyy-MM",
        }},
    ])
    rows = {r["id"]: r for r in
            out.selectExpr("id", "CAST(variant_get(doc, '$.k') AS BIGINT) AS k",
                           "geo.score AS gs", "_index").collect()}
    assert rows[1]["k"] == 7 and rows[1]["gs"] == 5
    assert rows[2]["k"] is None  # malformed JSON -> null variant
    assert rows[1]["_index"] == "logs-2024-03"
    assert rows[2]["_index"] == "logs-2024-12"
    # dot_expander into an EXISTING struct root
    df2 = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('a', 1) AS n", "id AS `n.b`"
    )
    out2 = ingest_pipeline(df2, [{"dot_expander": {"field": "n.b"}}])
    r = out2.selectExpr("n.a AS a", "n.b AS b").collect()[0]
    assert (r["a"], r["b"]) == (1, 1)
    with pytest.raises(ValueError, match="is not a struct"):
        ingest_pipeline(df2.withColumn("x", df2.id).selectExpr(
            "id", "id AS x", "id AS `x.y`"
        ), [{"dot_expander": {"field": "x.y"}}])
    with pytest.raises(ValueError, match="date_rounding"):
        ingest_pipeline(df, [{"date_index_name": {
            "field": "ts", "date_rounding": "q"}}])


def test_new_refusals_enumerate_reasons(docs):
    for p, frag in [("registered_domain", "Suffix List"),
                    ("fail", "exception control flow"),
                    ("terminate", "early-exit"),
                    ("inference", "deployed ML model"),
                    ("redact", "pii_redact")]:
        with pytest.raises(ValueError, match=frag):
            ingest_pipeline(docs, [{p: {"field": "name"}}])


def test_malformed_ips_yield_null(spark):
    """ADVICE r12: under Spark 4's default ANSI mode a short quad
    aborted the job (INVALID_ARRAY_INDEX_IN_ELEMENT_AT), non-numeric
    octets threw on CAST, and out-of-range octets silently
    misclassified.  The regex gate + try_* accessors in _ipv4_long
    restore the 'NULL/malformed yields NULL' contract for both
    network_direction and community_id."""
    df = spark.createDataFrame(
        [
            (1, "1.2.3", "10.0.0.1"),          # short quad
            (2, "abc.def.ghi.jkl", "10.0.0.1"),  # non-numeric
            (3, "300.1.2.3", "10.0.0.1"),      # out-of-range octet
            (4, "1.2.3.4.5", "10.0.0.1"),      # too many octets
            (5, "10.1.2.3", "10.9.9.9"),       # valid control row
            (6, "", "10.0.0.1"),               # empty string
        ],
        "id long, sip string, dip string",
    )
    out = ingest_pipeline(df, [{"network_direction": {
        "source_ip": "sip", "destination_ip": "dip",
        "internal_networks": ["private"],
        "target_field": "dir",
    }}]).collect()
    got = {r["id"]: r["dir"] for r in out}
    assert got == {1: None, 2: None, 3: None, 4: None,
                   5: "internal", 6: None}
    df2 = spark.createDataFrame(
        [(1, "1.2.3", "10.0.0.1", 80, 443, "tcp"),
         (2, "300.1.2.3", "10.0.0.1", 80, 443, "tcp"),
         (3, "10.0.0.1", "10.0.0.2", 80, 443, "tcp")],
        "id long, sip string, dip string, sp long, dp long, tr string",
    )
    out2 = ingest_pipeline(df2, [{"community_id": {
        "source_ip": "sip", "destination_ip": "dip",
        "source_port": "sp", "destination_port": "dp",
        "transport": "tr", "target_field": "cid",
    }}]).collect()
    got2 = {r["id"]: r["cid"] for r in out2}
    assert got2[1] is None and got2[2] is None
    assert got2[3] is not None and got2[3].startswith("1:")


def test_json_processor_honors_if(spark):
    """ADVICE r12: `if` on the json processor was accepted via
    _COMMON_OPTS but silently ignored — it now routes through
    _apply_conditional (condition-false rows keep the old value:
    NULL for a fresh target_field, the original string re-wrapped as
    a variant string when parsing in place)."""
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": 9}')], "id long, payload string"
    )
    out = ingest_pipeline(df, [{"json": {
        "field": "payload", "target_field": "doc", "if": "id = 1",
    }}])
    rows = {r["id"]: r for r in out.selectExpr(
        "id", "CAST(variant_get(doc, '$.k') AS BIGINT) AS k").collect()}
    assert rows[1]["k"] == 7
    assert rows[2]["k"] is None  # condition false -> untouched (NULL)
    # in-place parse: condition-false rows keep the raw string value
    out2 = ingest_pipeline(df, [{"json": {
        "field": "payload", "if": "id = 1",
    }}])
    vals = {r["id"]: r["s"] for r in out2.selectExpr(
        "id", "CAST(variant_get(payload, '$.k') AS BIGINT) AS s").collect()}
    assert vals[1] == 7 and vals[2] is None
    raw = {r["id"]: r["s"] for r in out2.selectExpr(
        "id", "CAST(payload AS STRING) AS s").collect()}
    assert raw[2] == '{"k": 9}'  # value preserved, just unparsed


def test_dot_expander_refuses_if(spark):
    df = spark.createDataFrame([(1, 2)], "id long, `g.s` long")
    with pytest.raises(ValueError, match="schema-level"):
        ingest_pipeline(df, [{"dot_expander": {
            "field": "g.s", "if": "id = 1"}}])


def test_dot_expander_multilevel_into_existing_root(spark):
    """ADVICE r12: 'n.b.c' into an existing root struct n that lacks
    the intermediate b failed with FIELD_NOT_FOUND — ES creates
    intermediate objects; the walk now builds the missing structs."""
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('a', 11) AS n", "id + 41 AS `n.b.c`"
    )
    out = ingest_pipeline(df, [{"dot_expander": {"field": "n.b.c"}}])
    r = out.selectExpr("n.a AS a", "n.b.c AS c").collect()[0]
    assert (r["a"], r["c"]) == (11, 42)
    assert "n.b.c" not in out.columns
    # intermediate EXISTS as struct: lands via nested withField,
    # preserving b's other fields
    df2 = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('b', named_struct('x', 7)) AS m",
        "id + 1 AS `m.b.c`"
    )
    out2 = ingest_pipeline(df2, [{"dot_expander": {"field": "m.b.c"}}])
    r2 = out2.selectExpr("m.b.x AS x", "m.b.c AS c").collect()[0]
    assert (r2["x"], r2["c"]) == (7, 2)
    # three-deep missing tail
    df3 = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('a', 1) AS p", "id AS `p.q.r.s`"
    )
    out3 = ingest_pipeline(df3, [{"dot_expander": {"field": "p.q.r.s"}}])
    r3 = out3.selectExpr("p.a AS a", "p.q.r.s AS s").collect()[0]
    assert (r3["a"], r3["s"]) == (1, 1)


def test_reroute(spark):
    df = spark.createDataFrame(
        [(1, "web", "prod", 50), (2, "api", "dev", 500)],
        "id long, svc string, env string, sz long",
    )
    # destination literal
    out = ingest_pipeline(df, [{"reroute": {"destination": "quarantine"}}])
    assert {r["_index"] for r in out.collect()} == {"quarantine"}
    # data-stream composition from {{field}} mustache refs
    out2 = ingest_pipeline(df, [{"reroute": {
        "dataset": "{{svc}}", "namespace": "{{ env }}"}}])
    got = {r["id"]: r["_index"] for r in out2.collect()}
    assert got == {1: "logs-web-prod", 2: "logs-api-dev"}
    # explicit type + literal dataset, conditional override chain
    out3 = ingest_pipeline(df, [
        {"reroute": {"type": "metrics", "dataset": "ops",
                     "namespace": "{{env}}"}},
        {"reroute": {"destination": "small", "if": "sz < 100"}},
    ])
    got3 = {r["id"]: r["_index"] for r in out3.collect()}
    assert got3 == {1: "small", 2: "metrics-ops-dev"}
    with pytest.raises(ValueError, match="destination OR dataset"):
        ingest_pipeline(df, [{"reroute": {
            "destination": "x", "dataset": "y"}}])
    with pytest.raises(ValueError, match="needs destination"):
        ingest_pipeline(df, [{"reroute": {}}])


def test_dot_expander_intermediate_scalar_refuses(spark):
    """ADVICE r13: an intermediate path segment that exists as a
    SCALAR must refuse like the root-level non-struct case —
    withField would silently replace the scalar with a new struct
    (data loss)."""
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('b', 7) AS n", "id AS `n.b.c`"
    )
    with pytest.raises(ValueError, match="is not a struct"):
        ingest_pipeline(df, [{"dot_expander": {"field": "n.b.c"}}])
    # deeper: n.b is a struct but n.b.q is a scalar blocking n.b.q.r
    df2 = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "named_struct('b', named_struct('q', 5)) AS n",
        "id AS `n.b.q.r`"
    )
    with pytest.raises(ValueError, match="'n.b.q' exists and is not"):
        ingest_pipeline(df2, [{"dot_expander": {"field": "n.b.q.r"}}])


def test_reroute_null_field_propagates(spark):
    """ADVICE r13: a NULL mustache-resolved field must yield a NULL
    _index (the module's NULL-propagating failure contract) — the
    old concat_ws SKIPPED the NULL and collapsed the segment to
    'logs-web'."""
    df = spark.createDataFrame(
        [(1, "web", "prod"), (2, "api", None)],
        "id long, svc string, env string",
    )
    out = ingest_pipeline(df, [{"reroute": {
        "dataset": "{{svc}}", "namespace": "{{env}}"}}])
    got = {r["id"]: r["_index"] for r in out.collect()}
    assert got == {1: "logs-web-prod", 2: None}


def test_uri_parts_keep_original_remove_if_successful(spark):
    """S34 re-scan (r14): the two remaining uri_parts options.
    keep_original copies the unparsed value to <target>_original;
    remove_if_successful clears the source only where the URI parsed
    (NULL is the columnar 'absent'), keeping it on non-URI rows."""
    df = spark.createDataFrame(
        [(1, "https://h.example.com/a/b.txt?q=1"), (2, "not a uri")],
        "id long, url string",
    )
    out = ingest_pipeline(df, [
        {"uri_parts": {"field": "url", "target_field": "u",
                       "keep_original": True,
                       "remove_if_successful": True}},
    ])
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["u_scheme"] == "https"
    assert rows[1]["u_domain"] == "h.example.com"
    assert rows[1]["u_path"] == "/a/b.txt"
    assert rows[1]["u_extension"] == "txt"
    assert rows[1]["u_original"] == "https://h.example.com/a/b.txt?q=1"
    assert rows[1]["url"] is None  # removed: parse succeeded
    assert rows[2]["u_scheme"] is None
    assert rows[2]["u_original"] == "not a uri"
    assert rows[2]["url"] == "not a uri"  # kept: parse failed
    # unknown option still refuses loudly
    with pytest.raises(ValueError, match="option"):
        ingest_pipeline(df, [{"uri_parts": {"field": "url",
                                            "bogus": True}}])
