"""Unit tests for training-data operator batch functions (vectorized
kernels, no Ray needed)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from hyparquet_writer_ray.functions.text import (
    bpe_token_count_batch,
    quality_score_batch,
    rolling_fingerprint_batch,
    token_count_batch,
    LangIdModel,
)


def test_token_count_matches_split():
    texts = ["a b c", "single", None, "x y"]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    out = token_count_batch(t)
    assert out.column("n_tokens").to_pylist() == [3, 1, None, 2]


def test_quality_scores_integers():
    t = pa.table({"text": ["the quick fox", "a", None]})
    out = quality_score_batch(t)
    assert out.column("n_chars").to_pylist() == [13, 1, None]
    assert out.column("n_tokens").to_pylist() == [3, 1, None]
    assert out.column("max_token_len").to_pylist()[0] == 5  # "quick"
    assert out.column("n_stopwords").to_pylist()[0] == 1  # "the"


def test_bpe_tokenizer_counts():
    t = pa.table({"text": ["don't stop, won't stop!", None, ""]})
    out = bpe_token_count_batch(t)
    counts = out.column("n_bpe_tokens").to_pylist()
    assert counts[1] is None and counts[2] == 0
    assert counts[0] > 4  # contractions + punctuation split out


def test_rolling_fingerprint_properties():
    t = pa.table({"text": ["abc", "abc", "abd", None, ""]})
    fps = rolling_fingerprint_batch(t).column("rolling_fp").to_pylist()
    assert fps[0] == fps[1]  # deterministic
    assert fps[0] != fps[2]  # content-sensitive
    assert fps[3] is None and fps[4] == 0
    # matches the scalar definition: sum(byte * BASE^(n-1-i)) mod 2^64
    base = 0x100000001B3
    want = 0
    for b in b"abc":
        want = (want * base + b) & (2**64 - 1)
    assert fps[0] == want


def test_langid_scripts_and_markers():
    m = LangIdModel()
    assert m.predict("der hund ist nicht da und die katze") == "de"
    assert m.predict("le chat est dans la maison pour toujours") == "fr"
    assert m.predict("这是中文文本") == "zh"
    assert m.predict("это русский текст") == "ru"
    assert m.predict(None) == "und"
    assert m.predict("the cat and the dog") == "en"


def test_langid_vectorized_matches_scalar_predict():
    """VERDICT r4 item 5: the vectorized __call__ must agree with the
    scalar predict() reference on every corner it vectorizes around —
    script priority in mixed prefixes, the 64-char prefix bound, the
    200-token cutoff, set() dedup of repeated markers, whitespace
    edges, U+0130 full casing, final sigma, nulls/empties — plus a
    seeded random mixed-language corpus."""
    import random

    m = LangIdModel()
    rng = random.Random(42)
    pools = {k: sorted(v) for k, v in
             __import__("hyparquet_writer_ray.functions.text",
                        fromlist=["_LANG_MARKERS"])._LANG_MARKERS.items()}
    fillers = ["zzz", "qqq", "kelime", "data", "web", "x1", "parquet"]
    texts: list = [
        None, "", "   ", "\t\n", "the cat and the dog",
        "der hund ist nicht da und die katze",
        "这是中文文本", "これはテキスト", "это русский текст",
        "x" * 63 + "日 plus latin", "x" * 64 + "日 the and of to is",
        "テキスト 漢字",          # kana first -> ja
        "漢字 テキスト",          # CJK first -> zh
        "İ the and of to is that for",     # U+0130 casing corner
        "ΣΟΦΟΣ the and of to is",          # final sigma corner
        " lead the and of to trail ",      # whitespace edges
        ("pad " * 199) + "the and of to is that for with",  # cutoff
        "the the the the und und und und",  # dedup: 1 vs 1 markers
    ]
    for _ in range(300):
        lang = rng.choice(list(pools))
        k = rng.randint(1, 8)
        words = rng.sample(pools[lang], k) + \
            [rng.choice(fillers) for _ in range(rng.randint(0, 12))]
        rng.shuffle(words)
        texts.append(" ".join(words))
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = m(t).column("pred_lang").to_pylist()
    want = [m.predict(x) for x in texts]
    assert got == want


def test_tumbling_window_agg(ray_session):
    import duckdb
    import ray.data

    from hyparquet_writer_ray.functions.windows import tumbling_window_agg

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["ts", "user_id"])
    out = tumbling_window_agg(ds, ts_col="ts", width_seconds=600, sum_col="user_id")
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("w_start")
    want = duckdb.sql(
        "SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS w_start, count(*) AS n, "
        f"sum(user_id) AS sum_user_id FROM '{src}' GROUP BY 1 ORDER BY 1"
    ).arrow()
    assert got.column("w_start").to_pylist() == want.column("w_start").to_pylist()
    assert got.column("n").to_pylist() == want.column("n").to_pylist()
    assert got.column("sum_user_id").to_pylist() == want.column("sum_user_id").to_pylist()


def test_bpe_independent_scanner_matches_regex():
    """The driver-side oracle scanner in __ray_entry__ must agree with
    the compiled-regex implementation on adversarial inputs."""
    import random
    import sys

    sys.path.insert(0, "/root/repo")
    from __ray_entry__ import _bpe_count_independent
    from hyparquet_writer_ray.functions.text import _BPE_PAT

    cases = [
        "", " ", "  ", "a", " a", "a ", "a  b", "don't stop, won't!",
        "it's we're I've I'm we'll I'd", "a\nb", "a\n\nb", "tab\tsep",
        "trailing   ", "...!!!", " ...", "under_score 123 mix3d",
        "'lone 'll 're'", "x'sx", "a'dd", "e.g., (i.e.) [sic]",
    ]
    rng = random.Random(0)
    alphabet = "ab c'.!\n\t_19"
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
              for _ in range(300)]
    for s in cases:
        assert _bpe_count_independent(s) == len(_BPE_PAT.findall(s)), repr(s)


def test_multimodal_decode_plumbing(ray_session):
    import ray.data

    from hyparquet_writer_ray.functions.multimodal import ImageDecodeStage, decode_images

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([b"imgbytes-a", None, b"imgbytes-b"], pa.binary()),
    })
    out = decode_images(ray.data.from_arrow(t), fake=True, out_size=4, batch_size=2)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("id")
    assert got.column("pixels").type == pa.list_(pa.uint8(), 16)
    assert got.column("decoded").to_pylist() == [True, False, True]
    pix = got.column("pixels").to_pylist()
    assert pix[1] is None
    # deterministic: same payload -> same pixels as a direct stage call
    stage = ImageDecodeStage(fake=True, out_size=4)
    assert pix[0] == stage._decode(b"imgbytes-a").reshape(-1).tolist()
    # the real path (auto backend) decodes genuine image bytes even
    # without PIL, via the stdlib PNG/BMP codec; junk payloads raise
    import numpy as np
    import pytest as _pytest

    from hyparquet_writer_ray.functions._imagecodec import encode_png

    real = ImageDecodeStage(out_size=4)
    src = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    got_px = real._decode(encode_png(src))
    assert got_px.shape == (4, 4)
    if real.backend == "stdlib":
        # nearest-neighbor at cell centers of the known source image
        assert (got_px == src[1::2, 1::2]).all()
        with _pytest.raises(ValueError):
            real._decode(b"not an image")


def test_hopping_window_agg(ray_session):
    import duckdb
    import ray.data

    from hyparquet_writer_ray.functions.windows import hopping_window_agg

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["ts", "user_id"])
    out = hopping_window_agg(ds, ts_col="ts", width_seconds=900,
                             slide_seconds=300, sum_col="user_id")
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    want = duckdb.sql(
        "SELECT (CAST(floor(epoch(ts)/300) AS BIGINT) - j) * 300 AS w_start, "
        "count(*) AS n, sum(user_id) AS s "
        f"FROM '{src}', range(0,3) t(j) GROUP BY 1 ORDER BY 1"
    ).arrow()
    assert got.column("w_start").to_pylist() == want.column("w_start").to_pylist()
    assert got.column("n").to_pylist() == want.column("n").to_pylist()
    assert got.column("sum_user_id").to_pylist() == want.column("s").to_pylist()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple"):
        hopping_window_agg(ds, width_seconds=700, slide_seconds=300)


def test_sessionize_gap_semantics(ray_session):
    import datetime

    import ray.data

    from hyparquet_writer_ray.functions.windows import sessionize

    def ts(minute):
        return datetime.datetime(2024, 1, 1, 0, minute)

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        # user 1: events at 0, 10, 50, 55 min with 30-min gap -> sessions
        # {0,10} and {50,55}; user 2: single event
        "ts": pa.array([ts(0), ts(10), ts(50), ts(55), ts(7)],
                       pa.timestamp("us")),
    })
    out = sessionize(ray.data.from_arrow(t), gap_seconds=1800)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rows = list(zip(*[got.column(c).to_pylist()
                      for c in ["user_id", "session_id", "n_events", "s_start", "s_end"]]))
    base = int(ts(0).replace(tzinfo=datetime.timezone.utc).timestamp())
    assert rows == [
        (1, 0, 2, base, base + 600),
        (1, 1, 2, base + 3000, base + 3300),
        (2, 0, 1, base + 420, base + 420),
    ]


def test_top_tokens_exact(ray_session):
    import ray.data

    from hyparquet_writer_ray.functions.text import top_tokens

    t = pa.table({"text": ["a b a", "b a c", "a d"]})
    out = top_tokens(ray.data.from_arrow(t), k=3)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rows = list(zip(got.column("token").to_pylist(), got.column("n").to_pylist()))
    assert rows == [("a", 4), ("b", 2), ("c", 1)]  # ties by token asc


def test_sessionize_string_keys(ray_session):
    import datetime

    import ray.data

    from hyparquet_writer_ray.functions.windows import sessionize

    def ts(minute):
        return datetime.datetime(2024, 1, 1, 0, minute)

    t = pa.table({
        "user_id": pa.array(["alice", "alice", "bob", "alice"]),
        "ts": pa.array([ts(0), ts(50), ts(5), ts(55)], pa.timestamp("us")),
    })
    out = sessionize(ray.data.from_arrow(t), gap_seconds=1800)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rows = list(zip(got.column("user_id").to_pylist(),
                    got.column("session_id").to_pylist(),
                    got.column("n_events").to_pylist()))
    assert rows == [("alice", 0, 1), ("alice", 1, 2), ("bob", 0, 1)]
    assert got.column("user_id").type == pa.string()


def test_stratified_sample_deterministic(ray_session):
    import ray.data

    from hyparquet_writer_ray.functions.sketches import _splitmix64
    from hyparquet_writer_ray.functions.text import stratified_sample

    n = 10_000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 3 else "de" for i in range(n)]),
    })
    fr = {"en": 0.25, "de": 0.5}
    out = stratified_sample(ray.data.from_arrow(t), fractions=fr)
    got = sorted(pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    # independent expected set from the same deterministic rule
    h = _splitmix64(np.arange(n, dtype=np.uint64))
    want = sorted(
        i for i in range(n)
        if int(h[i]) < int(fr["en" if i % 3 else "de"] * 2 ** 64)
    )
    assert got == want
    # sampled rates in the right ballpark
    en = sum(1 for i in got if i % 3)
    de = len(got) - en
    assert abs(en / (n * 2 / 3) - 0.25) < 0.02
    assert abs(de / (n / 3) - 0.5) < 0.03
    # rerun identical (determinism / resume safety)
    out2 = stratified_sample(ray.data.from_arrow(t), fractions=fr)
    got2 = sorted(pa.concat_tables(
        b for b in out2.iter_batches(batch_size=None, batch_format="pyarrow")
    ).column("doc_id").to_pylist())
    assert got2 == got
    # whitelist semantics: missing keys are dropped entirely
    only_de = stratified_sample(ray.data.from_arrow(t), fractions={"de": 1.0})
    kd = pa.concat_tables(b for b in only_de.iter_batches(
        batch_size=None, batch_format="pyarrow"))
    assert set(kd.column("lang").to_pylist()) == {"de"}


def test_redact_matches_python_re():
    """Arrow RE2 redaction == Python re.sub on the same rules (and the
    stacked-rule order matters: second rule sees first rule's output)."""
    import re

    import pyarrow as pa

    from hyparquet_writer_ray.functions.text import redact_batch

    texts = ["call 555 0199 now", "key value pairs hash", "the keyhash", None,
             "", "key key 42key"]
    rules = [(r"\b(key|value|hash)\b", "<T>"), (r"[0-9]+", "#")]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = redact_batch(t, rules).column("redacted").to_pylist()
    for txt, g in zip(texts, got):
        if txt is None:
            assert g is None
            continue
        want = txt
        for p, r in rules:
            want = re.sub(p, r, want)
        assert g == want, (txt, g, want)


def test_repetition_stats_vs_python_sets():
    import pyarrow as pa

    from hyparquet_writer_ray.functions.text import repetition_stats_batch

    texts = ["a b a a c", "x", None, "", "w w w w", "a b c d"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_stats_batch(t)
    for i, txt in enumerate(texts):
        nt = out.column("n_tokens")[i].as_py()
        nd = out.column("n_distinct_tokens")[i].as_py()
        tc = out.column("top_token_count")[i].as_py()
        if txt is None:
            assert nt is None and nd is None and tc is None
        else:
            toks = txt.split(" ")
            assert nt == len(toks)
            assert nd == len(set(toks))
            assert tc == max(toks.count(x) for x in set(toks))


def test_decontaminate_exact_ngram_overlap(ray_session):
    """Documents sharing ANY word 3-gram with the benchmark set drop;
    all others survive (exact string matching, nulls/short docs kept)."""
    import pyarrow as pa
    import ray.data

    from hyparquet_writer_ray.functions.text import decontaminate

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "the quick brown fox",     # contains bench gram -> drop
            "a quick brown cat",       # 'quick brown cat' no; 'a quick brown' no -> keep
            "quick brown fox jumps",   # 'quick brown fox' -> drop
            "totally unrelated words here",
            None,                      # null: kept
            "two words",               # < 3 tokens: kept
        ]),
    })
    bench = ["the quick brown fox ran"]
    out = decontaminate(ray.data.from_arrow(docs), bench, k=3)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert got.column("doc_id").to_pylist() == [1, 3, 4, 5]


def test_inverted_index_matches_duckdb(ray_session):
    """Postings and df equal DuckDB's unnest+DISTINCT formulation,
    including cross-batch (token, doc) dedup and empty tokens."""
    import duckdb

    import ray.data

    from hyparquet_writer_ray.functions.text import inverted_index

    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(
            [f"the cat sat {'x' * (i % 3)} on the mat {i % 5}"
             for i in range(40)]),
    })
    out = inverted_index(
        ray.data.from_arrow(docs).repartition(5), num_buckets=3)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("token")
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(
        "WITH p AS (SELECT DISTINCT u.tok AS token, doc_id FROM documents, "
        "unnest(string_split(text, ' ')) AS u(tok)) "
        "SELECT token, list(doc_id ORDER BY doc_id) AS doc_ids, "
        "CAST(count(*) AS BIGINT) AS df FROM p GROUP BY token ORDER BY token"
    ).arrow()
    got = got.combine_chunks()
    assert got.column("token").to_pylist() == want.column("token").to_pylist()
    assert got.column("doc_ids").to_pylist() == want.column("doc_ids").to_pylist()
    assert got.column("df").to_pylist() == want.column("df").to_pylist()


def test_histogram_exact_bins(ray_session):
    """Bin counts equal an independent numpy histogram with the same
    rule; nulls and out-of-range values excluded; empty bins present."""
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.stats import histogram

    rng = np.random.default_rng(3)
    vals = rng.normal(0, 2, 5000)
    vals[::97] = np.nan
    vals[::53] = 100.0  # out of range
    t = pa.table({"v": pa.array(vals, pa.float64())})
    out = histogram(ray.data.from_arrow(t).repartition(4),
                    "v", lo=-4.0, hi=4.0, bins=16)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("bin")
    x = vals[~np.isnan(vals)]
    x = x[(x >= -4.0) & (x <= 4.0)]
    w = (4.0 - (-4.0)) / 16
    b = np.minimum(np.floor((x - (-4.0)) / w).astype(np.int64), 15)
    want = np.bincount(b, minlength=16)
    assert got.column("bin").to_pylist() == list(range(16))
    assert got.column("n").to_pylist() == want.tolist()
    assert got.column("lo_edge").to_pylist()[0] == -4.0
    assert got.column("hi_edge").to_pylist()[-1] == 4.0


def test_deterministic_shuffle_reproducible(ray_session):
    """Same seed -> identical order across runs and partitionings;
    different seed -> different order; output is a permutation."""
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.shuffle import (
        deterministic_shuffle, shuffle_key)

    ids = pa.table({"doc_id": pa.array(list(range(1000)), pa.int64())})

    def run(seed, parts):
        out = deterministic_shuffle(
            ray.data.from_arrow(ids).repartition(parts),
            id_col="doc_id", seed=seed)
        return pa.concat_tables(
            b for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow")
        ).column("doc_id").to_pylist()

    a = run(7, 4)
    assert run(7, 9) == a, "order depends on partitioning"
    assert run(8, 4) != a, "seed has no effect"
    assert sorted(a) == list(range(1000)), "not a permutation"
    keys = shuffle_key(np.arange(1000, dtype=np.int64), 7)
    expect = np.arange(1000)[np.argsort(keys, kind="stable")].tolist()
    assert a == expect, "order differs from the pure key function"


def test_inverted_index_empty_blocks(ray_session):
    """Blocks with zero rows (over-repartitioned input) must not crash
    the pair stage (regression: length-1 boolean mask on empty array)."""
    import ray.data

    from hyparquet_writer_ray.functions.text import inverted_index

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b", "b c"]),
    })
    out = inverted_index(ray.data.from_arrow(docs).repartition(8),
                         num_buckets=2)
    got = pa.concat_tables(
        b for b in out.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("token")
    assert got.column("token").to_pylist() == ["a", "b", "c"]
    assert got.column("doc_ids").to_pylist() == [[0], [0, 1], [1]]


def test_weighted_sample_deterministic_and_weight_biased(ray_session):
    """Same seed+data -> identical sample at any partitioning; heavier
    rows appear with visibly higher frequency across seeds; zero/null
    weights never selected."""
    import numpy as np

    import ray.data

    from hyparquet_writer_ray.functions.shuffle import weighted_sample

    n = 2000
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        # first half weight 1, second half weight 20, a few zero/null
        "w": pa.array(
            [None if i % 500 == 0 else (0.0 if i % 501 == 0 else
             (20.0 if i >= n // 2 else 1.0)) for i in range(n)]),
    })

    def run(parts, seed):
        return weighted_sample(
            ray.data.from_arrow(t).repartition(parts),
            weight_col="w", id_col="doc_id", k=100, seed=seed)

    a, b = run(3, 7), run(11, 7)
    assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
    assert a.column("es_key").to_pylist() == b.column("es_key").to_pylist()
    excluded = {i for i in range(n) if i % 500 == 0 or i % 501 == 0}
    assert not excluded & set(a.column("doc_id").to_pylist())
    # bias check across 20 seeds: heavy rows should dominate ~20:1
    heavy = 0
    for seed in range(20):
        ids = run(2, seed).column("doc_id").to_pylist()
        heavy += sum(1 for i in ids if i >= n // 2)
    frac = heavy / (20 * 100)
    assert frac > 0.85, f"heavy-weight fraction only {frac}"


def test_weighted_sample_huge_weights_deterministic(ray_session):
    """Log-form ES keys never saturate: 1e18-scale weights still give
    a partitioning-invariant sample (regression: u**(1/w) rounded to
    exactly 1.0 and the winner depended on batch arrival order)."""
    import ray.data

    from hyparquet_writer_ray.functions.shuffle import weighted_sample

    t = pa.table({
        "doc_id": pa.array(list(range(500)), pa.int64()),
        "w": pa.array([1e18 + i for i in range(500)], pa.float64()),
    })

    def run(parts):
        return weighted_sample(
            ray.data.from_arrow(t).repartition(parts),
            weight_col="w", id_col="doc_id", k=20, seed=3
        ).column("doc_id").to_pylist()

    a = run(2)
    assert a == run(11) == run(5)
    keys = weighted_sample(
        ray.data.from_arrow(t), weight_col="w", id_col="doc_id",
        k=20, seed=3).column("es_key").to_pylist()
    assert len(set(keys)) == 20, "saturated keys collapsed to ties"


def test_histogram_rejects_degenerate_range(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from hyparquet_writer_ray.functions.stats import histogram

    ds = ray.data.from_arrow(pa.table({"v": pa.array([1.0, 2.0])}))
    with pytest.raises(ValueError):
        histogram(ds, "v", lo=3.0, hi=3.0, bins=4)
    with pytest.raises(ValueError):
        histogram(ds, "v", lo=0.0, hi=1.0, bins=0)
