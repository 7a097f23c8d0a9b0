"""Property-based tests (hypothesis) — SURVEY §5.2's differential
suite checks fixed corpora; these check INVARIANTS over generated
inputs, where the failure modes are boundary arithmetic (chunk
offsets, pack budgets, hash ranges) and dialect edge cases the fixed
corpus can't enumerate.

Spark-backed properties batch each hypothesis example into one
DataFrame job and keep max_examples small; transpiler string
properties are pure-Python and run at full default example counts.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_icebreaker_spark.transpiler import Transpiler

_t = Transpiler()

# ---------------------------------------------------------------
# transpiler string properties (no Spark — fast, many examples)
# ---------------------------------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_num = st.integers(min_value=0, max_value=10**6)
# no spaces/commas inside literals: the whitespace-mutation property
# below rewrites every space in the statement and must not be able to
# change literal CONTENT, only token separation
_str_lit = st.from_regex(r"[a-zA-Z0-9_.-]{0,12}", fullmatch=True)


def _scalar_exprs(col, n, s):
    """Snowflake-dialect scalar expressions over a column name, an
    integer literal, and a string literal."""
    return [
        f"IFF({col} > {n}, '{s}', NULL)",
        f"NVL({col}, {n})",
        f"NVL2({col}, {n}, 0)",
        f"ZEROIFNULL({col})",
        f"TRY_TO_NUMBER('{n}')",
        f"DATEADD(day, {n % 1000}, CURRENT_DATE)",
        f"LISTAGG({col}, ',')",
        f"OBJECT_CONSTRUCT('k', {col})",
        f"ARRAY_CONSTRUCT({n}, {n + 1})",
        f"SPLIT_PART('{s}', ',', 1)",
        f"STRTOK('{s}', ',', 1)",
        f"DIV0({col}, {n})",
    ]


@given(col=_ident, n=_num, s=_str_lit, idx=st.integers(0, 11), ws=st.integers(1, 4))
def test_transpile_whitespace_and_case_insensitive(col, n, s, idx, ws):
    """Extra whitespace and function-name case must not change the
    transpiled output (the tokenizer normalizes structure, not
    content)."""
    expr = _scalar_exprs(col, n, s)[idx]
    sql = f"SELECT {expr} AS v FROM t1"
    spaced = re.sub(r" ", " " * ws, sql)
    lowered = re.sub(
        r"\b(IFF|NVL2|NVL|ZEROIFNULL|TRY_TO_NUMBER|DATEADD|LISTAGG|"
        r"OBJECT_CONSTRUCT|ARRAY_CONSTRUCT|SPLIT_PART|STRTOK|DIV0|"
        r"SELECT|FROM|AS)\b",
        lambda m: m.group(0).lower(),
        sql,
    )
    base = _t.to_spark(sql)
    assert _t.to_spark(spaced).split() == base.split()
    assert _t.to_spark(lowered).lower().split() == base.lower().split()


@given(col=_ident, n=_num, s=_str_lit, idx=st.integers(0, 11))
def test_transpile_no_internal_placeholders_or_imbalance(col, n, s, idx):
    """Output never leaks internal placeholder names (the
    ARRAY_COMPACT_X-style bug class) and preserves parenthesis
    balance."""
    sql = f"SELECT {_scalar_exprs(col, n, s)[idx]} AS v FROM t1"
    out = _t.to_spark(sql)
    # placeholder leak check must ignore user STRING literals — the
    # generated literal itself may contain '_X' (hypothesis found it)
    code_only = re.sub(r"'(?:[^']|'')*'", "''", out)
    assert not re.search(r"_X\b", code_only), out
    assert out.count("(") == out.count(")"), out
    ok, _err = _t.can_transpile(sql)
    assert ok


# ---------------------------------------------------------------
# Spark-backed invariants (few examples, one job per example)
# ---------------------------------------------------------------

_spark_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.lists(
    st.text(
        alphabet="ab cdef",  # spaces included → multi-word docs
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=6,
)


@_spark_settings
@given(texts=_texts, size=st.integers(2, 50), overlap_frac=st.floats(0, 0.9))
def test_chunk_documents_reconstructs_text(spark, texts, size, overlap_frac):
    """Chunks tile the document exactly: first chunk + the non-overlap
    tail of each later chunk reassemble the original text, offsets
    match, and every chunk except the last is full-size."""
    from dbt_icebreaker_spark.xops.text import chunk_documents

    overlap = min(int(size * overlap_frac), size - 1)
    step = size - overlap
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(texts)))
    for doc_id, text in enumerate(texts):
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert [c.char_start for c in chunks] == [i * step for i in range(len(chunks))]
        rebuilt = chunks[0].chunk_text + "".join(
            c.chunk_text[overlap:] for c in chunks[1:]
        )
        assert rebuilt == text
        for c in chunks[:-1]:
            assert len(c.chunk_text) == size


@_spark_settings
@given(
    n=st.integers(1, 300),
    fraction=st.floats(0.0, 1.0),
    salt=st.integers(0, 5),
    parts=st.integers(1, 7),
)
def test_hash_sample_partition_invariant(spark, n, fraction, salt, parts):
    """Sample membership is a pure function of the id — identical for
    any physical partitioning of the same rows."""
    from dbt_icebreaker_spark.xops.sampling import hash_sample

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, "doc_id", fraction, salt).collect()}
    b = {
        r.doc_id
        for r in hash_sample(df.repartition(parts), "doc_id", fraction, salt).collect()
    }
    assert a == b


@_spark_settings
@given(n=st.integers(1, 200), epoch=st.integers(0, 4))
def test_epoch_shuffle_is_permutation(spark, n, epoch):
    from dbt_icebreaker_spark.xops.sampling import epoch_shuffle

    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = [r.doc_id for r in epoch_shuffle(df, "doc_id", epoch=epoch).collect()]
    assert sorted(out) == list(range(n))


@_spark_settings
@given(
    tokens=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    budget=st.integers(1, 64),
)
def test_pack_sequences_budget_overrun_bound(spark, tokens, budget):
    """A pack never exceeds the budget by more than one document (docs
    are never split), and pack ids are contiguous from 0 per shard."""
    from dbt_icebreaker_spark.xops.text import pack_sequences

    rows = [(i, " ".join("w" for _ in range(t))) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, "doc_id", "text", budget_tokens=budget, n_shards=4)
    by_shard: dict[int, list] = {}
    for r in sorted(out.collect(), key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        # pack ids are non-decreasing in doc order (floor of a
        # cumulative sum; ids may SKIP when one doc overflows the
        # budget — documented floor-chunking semantics)
        pids = [r.pack_id for r in shard_rows]
        assert pids == sorted(pids)
        packs = {}
        for r in shard_rows:
            packs.setdefault(r.pack_id, []).append(r.n_tokens)
        for pid, sizes in packs.items():
            # a pack only overruns because of its final doc
            assert len(sizes) == 1 or sum(sizes[:-1]) < budget


@_spark_settings
@given(
    n_left=st.integers(1, 40),
    n_right=st.integers(0, 40),
    n_keys=st.integers(1, 4),
    tol=st.one_of(st.none(), st.integers(1, 500)),
    seed=st.integers(0, 10**6),
)
def test_asof_join_matches_pandas_merge_asof(
    spark, n_left, n_right, n_keys, tol, seed
):
    """Differential oracle for the as-of join: pandas.merge_asof
    implements the same backward-inclusive semantics single-node."""
    import random

    import pandas as pd

    from dbt_icebreaker_spark.xops.temporal import asof_join

    rng = random.Random(seed)
    base = pd.Timestamp("2026-01-01")

    def rows(n):
        return [
            (
                rng.randrange(n_keys),
                (base + pd.Timedelta(seconds=rng.randrange(10_000))).to_pydatetime(),
                float(i),
            )
            for i in range(n)
        ]

    lrows = rows(n_left)
    # unique (k, ts) on the right: merge_asof's tie choice among
    # duplicate right timestamps is positional (frame order), which
    # no distributed engine can reproduce; asof_join's documented tie
    # rule (greatest payload) is covered by a dedicated unit test
    rrows = list({(k, ts): (k, ts, v) for k, ts, v in rows(n_right)}.values())
    left = spark.createDataFrame(lrows, "k long, ts timestamp, lv double")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, rv double")
    got = {
        (r.k, r.ts, r.lv): r.rv_r
        for r in asof_join(
            left, right, on="k",
            tolerance_seconds=float(tol) if tol else None,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["k", "ts", "rv"]).sort_values("ts")
    kwargs = dict(on="ts", by="k", direction="backward")
    if tol:
        kwargs["tolerance"] = pd.Timedelta(seconds=tol)
    if len(rpd):
        exp_df = pd.merge_asof(lpd, rpd, **kwargs)
    else:
        exp_df = lpd.assign(rv=None)
    exp = {
        (r.k, r.ts.to_pydatetime(), r.lv): (None if pd.isna(r.rv) else r.rv)
        for r in exp_df.itertuples()
    }
    assert got == exp


@_spark_settings
@given(
    n_points=st.integers(0, 40),
    n_intervals=st.integers(0, 15),
    n_keys=st.integers(1, 3),
    bin_seconds=st.sampled_from([60.0, 3600.0, 86400.0]),
    seed=st.integers(0, 10**6),
)
def test_range_join_matches_naive_inequality_join(
    spark, n_points, n_intervals, n_keys, bin_seconds, seed
):
    """The binned range join must return exactly the rows a naive
    cross-join + containment filter returns, for any bin width
    (bin width is a performance knob, never a semantics knob)."""
    import random

    import pandas as pd

    from dbt_icebreaker_spark.xops.temporal import range_join

    rng = random.Random(seed)
    base = pd.Timestamp("2026-01-01")

    def ts():
        return (base + pd.Timedelta(seconds=rng.randrange(200_000))).to_pydatetime()

    prows = [(rng.randrange(n_keys), ts(), float(i)) for i in range(n_points)]
    irows = []
    for i in range(n_intervals):
        a, b = ts(), ts()
        irows.append((rng.randrange(n_keys), min(a, b), max(a, b), float(i)))
    points = spark.createDataFrame(prows, "k long, pt timestamp, pv double")
    intervals = spark.createDataFrame(
        irows, "k long, s timestamp, e timestamp, iv double"
    )
    got = {
        (r.k, r.pt, r.pv, r.iv)
        for r in range_join(
            points, intervals, "pt", "s", "e", on="k", bin_seconds=bin_seconds
        ).collect()
    }
    exp = {
        (pk, pt, pv, iv)
        for pk, pt, pv in prows
        for ik, s, e, iv in irows
        if pk == ik and s <= pt <= e
    }
    assert got == exp


_raw_texts = st.lists(
    st.text(min_size=0, max_size=80),  # arbitrary unicode incl. \n\t, quotes, CJK
    min_size=1,
    max_size=5,
)


@_spark_settings
@given(texts=_raw_texts)
def test_filter_corpus_total_on_arbitrary_unicode(spark, texts):
    """filter_corpus is TOTAL: one row out per row in, every rule
    column and keep non-NULL, on arbitrary unicode (regex-special
    chars, newlines, empty strings) — a corpus filter that throws or
    NULLs on weird bytes silently drops data at 100 TB."""
    from dbt_icebreaker_spark.xops.text import filter_corpus

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = filter_corpus(df, "doc_id", "text").collect()
    assert len(rows) == len(texts)
    for r in rows:
        for c in rows[0].asDict():
            assert r[c] is not None, (c, r)


@_spark_settings
@given(texts=_raw_texts)
def test_remove_spans_preserves_unshared_text(spark, texts):
    """With min_df above the corpus size nothing is common, so every
    document must round-trip through the split/rebuild untouched
    (modulo the word-split convention: split on single spaces)."""
    from dbt_icebreaker_spark.xops.dedup import remove_duplicate_spans

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = remove_duplicate_spans(
        df, "doc_id", "text", k=3, min_df=len(texts) + 1
    ).collect()
    got = {r.doc_id: (r.cleaned_text, r.n_removed) for r in out}
    for i, t in enumerate(texts):
        assert got[i][1] == 0
        assert got[i][0] == t


@_spark_settings
@given(
    parents=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=40
    ),
    n_roots=st.integers(min_value=1, max_value=3),
)
def test_connect_by_matches_bfs(spark, parents, n_roots):
    """CONNECT BY → recursive CTE differential: for a random forest
    (node i's parent drawn from earlier nodes, first n_roots are
    roots), the rewritten hierarchy walk must equal a Python BFS —
    same reachable set, same level per node."""
    from dbt_icebreaker_spark.transpiler import Transpiler

    rows = []
    for i, p in enumerate(parents):
        node = i + 100
        parent = None if i < n_roots else (100 + (p % i)) if i > 0 else None
        rows.append((node, parent))
    # python BFS oracle
    from collections import defaultdict, deque

    kids = defaultdict(list)
    for node, parent in rows:
        if parent is not None:
            kids[parent].append(node)
    want = {}
    dq = deque((n, 1) for n, p in rows if p is None)
    while dq:
        n, lvl = dq.popleft()
        want[n] = lvl
        for k in kids[n]:
            dq.append((k, lvl + 1))

    df = spark.createDataFrame(rows, "emp long, mgr long")
    df.createOrReplaceTempView("cb_prop")
    out = spark.sql(
        Transpiler().to_spark(
            "SELECT emp, LEVEL FROM cb_prop START WITH mgr IS NULL "
            "CONNECT BY PRIOR emp = mgr"
        )
    )
    got = {r.emp: r.level for r in out.collect()}
    assert got == want


# ---------------------------------------------------------------- codecs
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    c=st.sampled_from([1, 2, 3, 4]),
    ft=st.sampled_from([0, 1, 2]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, c, ft, seed):
    """decode(encode(x)) == x for every shape/channel-count/filter —
    the property the x50 arithmetic oracle rests on."""
    import numpy as np

    from dbt_icebreaker_spark.xops.imaging import decode_png, encode_png

    arr = np.random.default_rng(seed).integers(0, 256, size=(h, w, c),
                                               dtype=np.uint8)
    dec = decode_png(encode_png(arr, filter_type=ft))
    assert dec is not None and dec.shape == (h, w, c)
    assert (dec == arr).all()


@given(
    n=st.integers(0, 2000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_wav_roundtrip_property(n, rate, seed):
    import numpy as np

    from dbt_icebreaker_spark.xops.audio import decode_wav, encode_wav

    samples = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int16
    )
    dec = decode_wav(encode_wav(samples, rate))
    assert dec is not None
    out, got_rate, ch = dec
    assert got_rate == rate and ch == 1 and (out == samples).all()


@given(data=st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_codecs_never_crash_on_garbage(data):
    """Malformed bytes → None, never an exception (the quarantine
    contract every mapInPandas decode op relies on)."""
    from dbt_icebreaker_spark.xops.audio import decode_wav
    from dbt_icebreaker_spark.xops.imaging import decode_png
    from dbt_icebreaker_spark.xops.multimodal import probe_bytes

    decode_png(data)
    decode_png(b"\x89PNG\r\n\x1a\n" + data)
    decode_wav(data)
    decode_wav(b"RIFF" + data)
    probe_bytes(data)


# ------------------------------------------------------------ codecs
# Property tests for the pure-numpy media codecs: JPEG (baseline +
# progressive) and the MJPEG-MP4 mux/demux. No Spark session needed —
# these are executor-side kernels.
import numpy as np  # noqa: E402

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@settings(max_examples=20, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**32 - 1))
def test_jpeg_baseline_progressive_bit_identical(dims, seed):
    """For ANY uint8 image, progressive encode decodes to exactly the
    same pixels as baseline encode (same coefficients, same quant) —
    pins all four Annex-G scan kinds against the sequential path."""
    from dbt_icebreaker_spark.xops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    h, w = dims
    a = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    db = decode_jpeg(encode_jpeg(a))
    dp = decode_jpeg(encode_jpeg_progressive(a))
    assert db is not None and dp is not None
    assert db.shape == (h, w, 1)
    assert np.array_equal(db, dp)
    # all-ones quant: bounded coefficient-rounding error only
    assert np.abs(db[:, :, 0].astype(int) - a.astype(int)).max() <= 3


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    cut=st.floats(0.01, 0.99),
    flip_at=st.integers(2, 4000),
    flip_to=st.integers(0, 255),
)
def test_jpeg_decode_never_raises_on_corruption(seed, cut, flip_at, flip_to):
    """Truncation and byte corruption quarantine (None or a decoded
    array) — never an exception escaping into a Spark task."""
    from dbt_icebreaker_spark.xops.jpeg import decode_jpeg, encode_jpeg

    a = np.random.default_rng(seed).integers(0, 256, size=(16, 16), dtype=np.uint8)
    raw = bytearray(encode_jpeg(a))
    raw = raw[: max(2, int(len(raw) * cut))]
    if flip_at < len(raw):
        raw[flip_at] = flip_to
    out = decode_jpeg(bytes(raw))
    assert out is None or out.dtype == np.uint8


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 8),
    fps=st.integers(1, 30),
    seed=st.integers(0, 2**32 - 1),
    cut=st.floats(0.05, 0.98),
)
def test_mp4_mux_demux_roundtrip_and_corruption(n, fps, seed, cut):
    from dbt_icebreaker_spark.xops.jpeg import encode_jpeg
    from dbt_icebreaker_spark.xops.video import demux_mp4_samples, mux_mjpeg_mp4

    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 256, size=(8, 8), dtype=np.uint8))
        for _ in range(n)
    ]
    raw = mux_mjpeg_mp4(frames, fps=fps, width=8, height=8)
    info = demux_mp4_samples(raw)
    assert info["codec"] == "jpeg" and len(info["samples"]) == n
    for i, (off, size, t) in enumerate(info["samples"]):
        assert raw[off : off + size] == frames[i]
        assert t == i * (1000 // fps)
    # arbitrary truncation must never raise
    out = demux_mp4_samples(raw[: max(12, int(len(raw) * cut))])
    assert out is None or isinstance(out, dict)


# ---------------------------------------------------------------
# round-4 probes: H.264 SPS, mp3 frame walk, Jaro-Winkler vs DuckDB
# ---------------------------------------------------------------

@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 240).map(lambda x: x * 2),  # 4:2:0 crop units
    h=st.integers(1, 136).map(lambda x: x * 2),
    profile=st.sampled_from([66, 77, 100, 110]),
    level=st.integers(10, 52),
)
def test_sps_build_parse_roundtrip(w, h, profile, level):
    """Any even WxH survives build_sps → parse_sps exactly, including
    the crop-rectangle arithmetic for non-MB-multiple sizes."""
    from dbt_icebreaker_spark.xops import h264

    sps = h264.parse_sps(h264.build_sps(w, h, profile_idc=profile, level_idc=level))
    assert (sps["width"], sps["height"]) == (w, h)
    assert sps["profile_idc"] == profile and sps["level_idc"] == level


@settings(max_examples=40, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_h264_probe_never_raises_on_garbage(data):
    from dbt_icebreaker_spark.xops import h264

    out = h264.probe_h264(data)
    assert out is None or isinstance(out, dict)


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 30),
    rate=st.sampled_from([32000, 44100, 48000]),
    channels=st.sampled_from([1, 2]),
    id3_len=st.integers(0, 64),
    junk=st.binary(min_size=0, max_size=30),
)
def test_mp3_probe_frame_walk_exact(n, rate, channels, id3_len, junk):
    """Frame count and duration are exact over any CBR schedule, with
    or without an ID3v2 tag / junk prefix; garbage alone never probes
    as mp3 (chained-sync requirement)."""
    from dbt_icebreaker_spark.xops import audio

    raw = audio.build_mp3_frames(
        n, sample_rate=rate, channels=channels,
        id3=b"\x00" * id3_len if id3_len else b"",
    )
    p = audio.probe_mp3(raw)
    assert p is not None and p["n_frames"] == n
    assert abs(p["duration_s"] - n * 1152 / rate) < 1e-9
    assert p["channels"] == channels
    # junk-only input must not probe
    assert audio.probe_mp3(junk) is None


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="abcdex -123", min_size=0, max_size=12),
            st.text(alphabet="abcdex -123", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_jaro_winkler_matches_duckdb(spark, duck, pairs):
    """The pure-JVM Jaro-Winkler lambda chain stays pinned to DuckDB's
    jaro_winkler_similarity (the oracle reference) on random pairs —
    the CI version of the 5000-pair dev fuzz. Integer 0-100 contract:
    compare the rounded values both engines produce."""
    from dbt_icebreaker_spark.transpiler import Transpiler

    t2 = Transpiler()
    rows = ", ".join(
        "(" + ("'" + a.replace("'", "''") + "'") + ", "
        + ("'" + b.replace("'", "''") + "'") + ")"
        for a, b in pairs
    )
    sql = t2.to_spark(
        f"SELECT a, b, JAROWINKLER_SIMILARITY(a, b) AS jw "
        f"FROM (VALUES {rows}) AS t(a, b)"
    )
    got = {(r.a, r.b): r.jw for r in spark.sql(sql).collect()}
    for a, b in pairs:
        d = duck.execute(
            "SELECT CAST(ROUND(100 * jaro_winkler_similarity(lower(?), lower(?))) AS BIGINT)",
            [a, b],
        ).fetchone()[0]
        assert got[(a, b)] == d, (a, b, got[(a, b)], d)
