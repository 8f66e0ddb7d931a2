import pytest

from pyspark.sql import functions as F

from bqetl_spark.functions import text as tx


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "der hund ist ein guter freund und das ist schön", "de"),
        (3, "le chat est sur la table et il ne bouge pas", "fr"),
        (4, "", "und"),
        (5, "zzzzz!!! ??? ###", "und"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "expect_lang"])


def test_token_count(spark):
    df = _docs(spark).withColumn("n", tx.token_count("text"))
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got[1] == 9
    assert got[4] == 0


def test_bpe_ish_token_count_monotone(spark):
    df = _docs(spark).withColumn("n", tx.bpe_ish_token_count("text"))
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got[1] >= 9          # subword count ≥ word count
    assert got[5] > 0           # punctuation counts


def test_lang_id(spark):
    out = tx.lang_id(_docs(spark))
    got = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[5] == "und"      # zero stopword evidence


def test_quality_score_flags_junk(spark):
    out = tx.quality_score(_docs(spark))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["keep"] is True
    assert got[5]["keep"] is False  # too few tokens + pure punctuation


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")],
        ["doc_id", "text"])
    out = df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()
    fps = {r["doc_id"]: r["fp"] for r in out}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co or https://x.io/p?q=1 or +1 555-0199 end"),
         (2, "no pii here")], ["id", "t"])
    got = {r["id"]: (r["clean"], r["n"])
           for r in df.select("id", tx.redact_pii("t").alias("clean"),
                              tx.pii_count("t").alias("n")).collect()}
    assert got[1] == ("mail <EMAIL> or <URL> or <PHONE> end", 3)
    assert got[2] == ("no pii here", 0)


def test_gram_repetition_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),      # 'spam spam' x3 of 3 bigrams
         (2, "a b c d"),                  # all bigrams unique
         (3, "one")], ["doc_id", "text"]) # too short: excluded
    got = {r["doc_id"]: r for r in tx.gram_repetition(df).collect()}
    assert got[1]["rep_ratio"] == 1.0 and got[1]["n_grams"] == 3
    assert got[2]["rep_ratio"] == 1.0 / 3
    assert 3 not in got


# ------------------------------------------------ token entropy (r7) --

def test_token_entropy_hand_computation(spark):
    import math

    from bqetl_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [(1, "a a b c"),          # n=4: a:2, b:1, c:1
         (2, "x x x x"),          # n=4: single token -> entropy 0
         (3, "   "),              # blank -> filtered
         (4, "u v w")],           # uniform
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 4}

    def h(counts, n):
        return sum(c * math.floor(10**6 * math.log(n / c))
                   for c in counts) // n

    assert got[1]["n_tokens"] == 4
    assert got[1]["entropy_ppm"] == h([2, 1, 1], 4)
    assert got[1]["top_share_ppm"] == 2 * 10**6 // 4
    assert got[2]["entropy_ppm"] == 0
    assert got[2]["top_share_ppm"] == 10**6
    assert got[4]["entropy_ppm"] == h([1, 1, 1], 3)
    assert got[4]["top_share_ppm"] == 10**6 // 3


def test_token_entropy_ordering_signal(spark):
    """Repetitive text must score lower entropy / higher share than
    diverse text of the same length."""
    from bqetl_spark.functions.text import token_entropy

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam ham"),
         (2, "one two three four five six")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy_ppm"] < got[2]["entropy_ppm"]
    assert got[1]["top_share_ppm"] > got[2]["top_share_ppm"]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_entropy_ln_margin_on_gate_corpora(sf_dir):
    """Every OBSERVED (count, n) pair's 1e6·ln(n/count) must sit >1e-5
    from an integer so a 1-ulp libm divergence can't flip the floor
    (the tfidf discipline; 1e-5 keeps ~4 orders of headroom over ulp
    noise at this magnitude)."""
    import glob
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    texts = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    pairs = set()
    for x in texts:
        toks = (x or "").split()
        if not toks:
            continue
        n = len(toks)
        for c in Counter(toks).values():
            pairs.add((c, n))
    for c, n in pairs:
        if c == n:
            continue  # ln(1) = 0 exactly
        v = 10**6 * math.log(n / c)
        assert abs(v - round(v)) > 1e-5, (c, n, v)


def test_entropy_ln_margin_exhaustive_small_domain():
    """Beyond the observed corpus pairs: audit EVERY rational n/c with
    n <= 800 (superset of anything the fuzz tier's <=12-token docs or
    the shipped corpora's <=~120-token docs can produce). Worst case in
    this domain is 3.65e-6 at (c=359, n=473) — ulp noise of a double ln
    at magnitude ~3e5 is ~6e-11, so even the worst pair keeps >4 orders
    of headroom; assert the 1e-6 floor holds so a regression in the
    formula (e.g. a changed scale) trips loudly."""
    import math

    for n in range(2, 801):
        for c in range(1, n):
            v = 10**6 * math.log(n / c)
            assert abs(v - round(v)) > 1e-6, (c, n, v)


# ------------------------------------------------ bigram-LM score (r7) --

def _py_lm_scores(rows, ref_mod=10, ref_keep=3):
    """Pure-Python reference of lm_score (add-one bigram NLL)."""
    import math
    from collections import Counter

    toks = {i: (t or "").split() for i, t in rows if (t or "").strip()}
    ref = {i: w for i, w in toks.items() if i % ref_mod < ref_keep}
    vocab = {t for w in ref.values() for t in w}
    bg, cx = Counter(), Counter()
    for w in ref.values():
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
            cx[a] += 1
    out = {}
    v = len(vocab)
    for i, w in toks.items():
        if len(w) < 2:
            continue
        s = 0
        for a, b in zip(w, w[1:]):
            s += math.floor(10**6 * math.log(
                (cx.get(a, 0) + v) / (bg.get((a, b), 0) + 1)))
        n = len(w) - 1
        out[i] = (n, s // n)
    return out


def test_lm_score_matches_python_reference(spark):
    rows = [(0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "a dog sat on a log"),
            (3, "the cat sat on the mat again"),   # reference-like
            (11, "zzz qqq www eee"),               # fully unseen
            (12, "the cat sat"),
            (13, "single"),                        # no pairs -> excluded
            (14, "   "),                           # blank -> excluded
            (25, "on the mat the cat sat")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_pairs"], r["nll_ppm"])
           for r in tx.lm_score(df).collect()}
    assert got == _py_lm_scores(rows)


def test_lm_score_unseen_context_is_ln_v(spark):
    """A doc whose every context is out-of-vocabulary scores exactly
    floor(1e6·ln(V)) per pair — the smoothing floor."""
    import math

    rows = [(0, "u v w x y z"), (15, "aa bb cc dd")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    v = 6  # reference = doc 0 only
    want = math.floor(10**6 * math.log(v))
    row = {r["doc_id"]: r for r in tx.lm_score(df).collect()}[15]
    assert row["nll_ppm"] == want


def test_lm_score_reference_like_beats_gibberish(spark):
    """The signal the filter exists for: on the real corpus, docs in the
    reference slice score lower mean NLL than a synthetic shuffled-
    vocabulary gibberish doc scored by the same model."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    scored = tx.lm_score(docs)
    stats = (scored.withColumn(
        "in_ref", (F.pmod(F.col("doc_id"), F.lit(10)) < 3))
        .groupBy("in_ref").agg(F.avg("nll_ppm").alias("m")).collect())
    m = {r["in_ref"]: r["m"] for r in stats}
    assert m[True] <= m[False] * 1.05  # ref slice is in-distribution


def test_lm_score_validation(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        tx.lm_score(df, ref_mod=0)
    with pytest.raises(ValueError):
        tx.lm_score(df, ref_mod=10, ref_keep=11)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_lm_ln_margin_on_gate_corpora(sf_dir):
    """Every OBSERVED (ctx+V, cb+1) operand pair of the lm_perplexity
    gate must put 1e6·ln(num/den) >1e-5 from an integer (the entropy
    audit's discipline applied to the LM's operand domain)."""
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pydict()
    toks = {i: (x or "").split() for i, x in zip(t["doc_id"], t["text"])
            if (x or "").strip()}
    ref = {i: w for i, w in toks.items() if i % 10 < 3}
    vocab = {tk for w in ref.values() for tk in w}
    bg, cx = Counter(), Counter()
    for w in ref.values():
        for a, b in zip(w, w[1:]):
            bg[(a, b)] += 1
            cx[a] += 1
    v = len(vocab)
    seen = set()
    for w in toks.values():
        for a, b in zip(w, w[1:]):
            seen.add((cx.get(a, 0) + v, bg.get((a, b), 0) + 1))
    for num, den in seen:
        if num == den:
            continue  # ln(1) = 0 exactly
        x = 10**6 * math.log(num / den)
        assert abs(x - round(x)) > 1e-5, (num, den, x)


def test_lm_tail_split_terciles_balanced_and_ordered(spark):
    """Per source: tercile sizes differ by <= 1 (ntile contract), and
    mean NLL is monotone head <= middle <= tail (the split orders by
    NLL, so this holds by construction — it pins the bucket labeling
    didn't get inverted)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = tx.lm_tail_split(docs).collect()
    from collections import defaultdict
    sizes = defaultdict(lambda: defaultdict(int))
    nlls = defaultdict(lambda: defaultdict(list))
    for r in out:
        sizes[r["source"]][r["bucket"]] += 1
        nlls[r["source"]][r["bucket"]].append(r["nll_ppm"])
    for src, b in sizes.items():
        assert set(b) == {"head", "middle", "tail"}, src
        assert max(b.values()) - min(b.values()) <= 1, (src, dict(b))
        mh = sum(nlls[src]["head"]) / b["head"]
        mm = sum(nlls[src]["middle"]) / b["middle"]
        mt = sum(nlls[src]["tail"]) / b["tail"]
        assert mh <= mm <= mt, (src, mh, mm, mt)


def test_ngram_novelty_reference_docs_score_zero(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = tx.ngram_novelty(docs, n=3)
    ref = out.filter(F.pmod(F.col("doc_id"), F.lit(10)) < 3)
    bad = ref.filter(F.col("novelty_ppm") != 0).count()
    assert bad == 0
    # non-reference docs: novelty in [0, 1e6] and someone is novel
    rest = out.filter(F.pmod(F.col("doc_id"), F.lit(10)) >= 3)
    rows = rest.collect()
    assert all(0 <= r["novelty_ppm"] <= 1_000_000 for r in rows)
    assert all(r["n_seen"] <= r["n_grams"] for r in rows)


def test_ngram_novelty_fully_novel_and_fully_seen(spark):
    rows = [(0, "a b c d"),            # reference
            (15, "a b c d"),           # identical -> novelty 0
            (16, "x y z w")]           # disjoint -> novelty 1e6
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["novelty_ppm"]
           for r in tx.ngram_novelty(df, n=3).collect()}
    assert got[15] == 0 and got[16] == 1_000_000


def test_ngram_novelty_validation(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        tx.ngram_novelty(df, n=0)
    with pytest.raises(ValueError):
        tx.ngram_novelty(df, ref_mod=0)


# ------------------------------------------------ DSIR weights (r7) --

def _dsir_py(docs, buckets=8192, ref_mod=10, ref_keep=3):
    """Reference implementation of dsir_weights on plain Python dicts."""
    import hashlib
    import math
    from collections import Counter

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % buckets

    feats = []  # (doc_id, bucket, is_ref)
    for i, text in docs:
        if not text.strip():
            continue
        w = text.strip().split()
        fs = [f"1:{t}" for t in w]
        fs += [f"2:{a} {b}" for a, b in zip(w, w[1:])]
        for f in fs:
            feats.append((i, bucket(f), i % ref_mod < ref_keep))
    n_r = len(feats)
    n_t = sum(1 for _, _, r in feats if r)
    cr, ct = Counter(b for _, b, _ in feats), Counter(
        b for _, b, r in feats if r)
    out = {}
    for i, b, _ in feats:
        s = math.floor(10**6 * math.log(
            ((ct[b] + 1) * (n_r + buckets))
            / ((cr[b] + 1) * (n_t + buckets))))
        nf, lw = out.get(i, (0, 0))
        out[i] = (nf + 1, lw + s)
    return out


def test_dsir_weights_matches_reference_impl(spark):
    docs = [(0, "alpha beta gamma"), (1, "alpha beta"), (2, "delta"),
            (3, "zz yy xx ww"), (7, "alpha beta gamma delta"),
            (13, "qq rr"), (14, "  "), (25, "alpha")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_feats"], r["logw_micro"])
           for r in tx.dsir_weights(df, buckets=64).collect()}
    assert got == _dsir_py(docs, buckets=64)


def test_dsir_target_slice_scores_higher_on_gate_corpus(spark):
    """The reference slice IS the target model's training data, so its
    mean importance weight must exceed the non-reference mean — the
    direction DSIR selects by."""
    import statistics

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = tx.dsir_weights(docs).collect()
    ref = [r["logw_micro"] for r in rows if r["doc_id"] % 10 < 3]
    non = [r["logw_micro"] for r in rows if r["doc_id"] % 10 >= 3]
    assert statistics.mean(ref) > statistics.mean(non)


def test_dsir_empty_reference_slice_yields_empty(spark):
    df = spark.createDataFrame([(5, "a b"), (9, "c d")],
                               ["doc_id", "text"])
    assert tx.dsir_weights(df, ref_mod=10, ref_keep=3).collect() == []


def test_dsir_validation(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        tx.dsir_weights(df, buckets=1)
    with pytest.raises(ValueError):
        tx.dsir_weights(df, ref_mod=10, ref_keep=0)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_dsir_ln_margin_on_gate_corpora(sf_dir):
    """Every OBSERVED ((ct+1)(nr+B), (cr+1)(nt+B)) operand pair of the
    dsir_weights gate must put 1e6·ln(num/den) > 1e-5 from an integer,
    and both products must stay IEEE-exact (< 2^53)."""
    import hashlib
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    B = 8192
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pydict()
    feats = []
    for i, x in zip(t["doc_id"], t["text"]):
        w = (x or "").strip().split()
        if not w:
            continue
        fs = [f"1:{tk}" for tk in w] + [f"2:{a} {b}"
                                        for a, b in zip(w, w[1:])]
        for f in fs:
            feats.append(
                (int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B,
                 i % 10 < 3))
    n_r, n_t = len(feats), sum(1 for _, r in feats if r)
    cr = Counter(b for b, _ in feats)
    ct = Counter(b for b, r in feats if r)
    for b in cr:
        num = (ct[b] + 1) * (n_r + B)
        den = (cr[b] + 1) * (n_t + B)
        assert num < 2**53 and den < 2**53
        if num == den:
            continue  # ln(1) = 0 exactly
        x = 10**6 * math.log(num / den)
        assert abs(x - round(x)) > 1e-5, (b, num, den, x)


def test_lm_tail_trained_thresholds_and_buckets(spark):
    """r8 trained split: buckets are consistent with the calibration
    slice's exact tercile order statistics — every doc's bucket is
    reproducible from the calibration scores alone — and bucket NLL
    ranges are ordered head <= middle <= tail within a source."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = tx.lm_tail_split_trained(docs).collect()
    from collections import defaultdict
    cal = defaultdict(list)
    for r in out:
        if 3 <= r["doc_id"] % 10 < 5:
            cal[r["source"]].append((r["nll_ppm"], r["doc_id"]))
    for r in out:
        c = sorted(cal[r["source"]])
        if not c:
            assert r["bucket"] == "uncalibrated"
            continue
        n = len(c)
        t33 = c[(n - 1) // 3][0]
        t66 = c[(2 * (n - 1)) // 3][0]
        want = ("head" if r["nll_ppm"] <= t33
                else "middle" if r["nll_ppm"] <= t66 else "tail")
        assert r["bucket"] == want, (r, t33, t66)


def test_lm_tail_trained_validation(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b", "s")],
                                 ["doc_id", "text", "source"])
    with pytest.raises(ValueError, match="calibration"):
        tx.lm_tail_split_trained(docs, ref_keep=3, cal_keep=8)


# ------------------------------------------- trained lang-id (r9) --

def _langid_fixture(spark):
    """A small REAL multilingual corpus: per language, 6 training docs
    (id%10 in 0..2 via id construction) + 2 hold-out docs. Hold-out
    texts avoid every LANG_STOPWORDS word, so the stopword heuristic is
    blind on them while trigram evidence (orthography, function-word
    fragments, CJK script) remains."""
    samples = {
        "en": ["weather forecasting requires gathering measurements",
               "children walked slowly through autumn leaves yesterday",
               "scientists discovered remarkable patterns during research",
               "freshly baked bread smells wonderful every morning",
               "travellers crossed mountains carrying heavy backpacks",
               "libraries preserve knowledge across many generations",
               # hold-out (no stopwords):
               "musicians rehearsed quietly backstage before evening performances",
               "engineers tested bridges under heavy winter loads"],
        "de": ["wettervorhersage erfordert sorgfaeltige messungen taeglich",
               "kinder gingen langsam durch herbstlaub gestern spaziert",
               "wissenschaftler entdeckten bemerkenswerte muster waehrend forschung",
               "frisch gebackenes brot duftet herrlich jeden morgen",
               "reisende ueberquerten berge schwere rucksaecke tragend",
               "bibliotheken bewahren wissen ueber viele generationen",
               "musiker probten leise hinter buehne vor abendlichen auffuehrungen",
               "ingenieure prueften bruecken unter schweren winterlasten"],
        "fr": ["prevoir meteo demande rassembler mesures soigneusement",
               "enfants marchaient lentement parmi feuilles automne hier",
               "chercheurs decouvrirent motifs remarquables pendant recherches",
               "pain fraichement cuit sent merveilleusement chaque matin",
               "voyageurs traverserent montagnes portant lourds sacs",
               "bibliotheques conservent savoir travers nombreuses generations",
               "musiciens repetaient doucement derriere scene avant representations",
               "ingenieurs verifiaient ponts sous lourdes charges hivernales"],
        "es": ["pronosticar tiempo requiere reunir mediciones cuidadosamente",
               "ninos caminaban despacio entre hojas otono ayer",
               "cientificos descubrieron patrones notables durante investigaciones",
               "pan recien horneado huele maravillosamente cada manana",
               "viajeros cruzaron montanas cargando mochilas pesadas",
               "bibliotecas conservan conocimiento durante muchas generaciones",
               "musicos ensayaban silenciosamente tras escenario antes funciones",
               "ingenieros revisaron puentes bajo pesadas cargas invernales"],
        "zh": ["天气预报需要收集大量的测量数据",
               "孩子们昨天慢慢走过秋天的落叶",
               "科学家在研究中发现了显著的规律",
               "新鲜出炉的面包每天早晨闻起来很香",
               "旅行者背着沉重的背包翻越高山",
               "图书馆世代保存着人类的知识",
               "音乐家晚上演出前在后台安静地排练",
               "工程师在研究中检测桥梁保存测量数据"]}
    # ids: residue j%3 (< 3, training) for the first 6 docs per lang,
    # residue 3 + (j-6) (hold-out) for the last two
    rows = []
    for li, (lang, texts) in enumerate(sorted(samples.items())):
        for j, t in enumerate(texts):
            residue = j % 3 if j < 6 else 3 + (j - 6)
            rows.append((100 * (li * 8 + j) + residue, lang, t))
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_lang_id_trained_beats_heuristic_on_real_text(spark):
    """Hold-out docs (id%10 in {3,4}) contain NO stopwords: the heuristic
    scores 0 evidence ('und') on every non-zh hold-out, while the
    trained trigram model classifies all 10 hold-outs correctly."""
    df = _langid_fixture(spark)
    out = {r["doc_id"]: r for r in tx.lang_id_trained(df).collect()}
    release = [r for i, r in out.items() if i % 10 >= 3]
    assert len(release) == 10
    trained_acc = sum(r["lang"] == r["pred_lang"] for r in release)
    heur = {r["doc_id"]: r for r in
            tx.lang_id(df).select("doc_id", "lang", "lang_pred").collect()}
    heur_acc = sum(1 for i, r in heur.items()
                   if i % 10 >= 3 and r["lang"] == r["lang_pred"])
    assert trained_acc == 10, [(r["lang"], r["pred_lang"])
                               for r in release]
    assert trained_acc > heur_acc
    # the heuristic is blind on the stopword-free non-zh hold-outs
    assert all(heur[i]["lang_pred"] in ("und", "zh")
               for i in heur if i % 10 >= 3 and heur[i]["lang"] != "zh")


def test_lang_id_trained_training_slice_perfect(spark):
    """Docs the model trained on must classify correctly (sanity: the
    argmax machinery sees its own evidence)."""
    df = _langid_fixture(spark)
    out = tx.lang_id_trained(df).collect()
    train = [r for r in out if r["doc_id"] % 10 < 3]
    assert train and all(r["lang"] == r["pred_lang"] for r in train)


def test_lang_id_trained_excludes_short_docs_and_validates(spark):
    df = spark.createDataFrame(
        [(0, "en", "ab"), (1, "en", ""),
         (2, "en", "hello world training text"), (13, "en", "abcdef")],
        ["doc_id", "lang", "text"])
    got = tx.lang_id_trained(df)
    assert sorted(r["doc_id"] for r in got.collect()) == [2, 13]
    with pytest.raises(ValueError):
        tx.lang_id_trained(df, buckets=1)
    with pytest.raises(ValueError):
        tx.lang_id_trained(df, ref_mod=10, ref_keep=0)


def test_lang_id_trained_ln_margin_on_gate_corpus():
    """Every observed (c+1, nl+B) operand pair of the gate's ln must sit
    > 1e-5 from an integer after the 1e6 scale (the dsir discipline)."""
    import hashlib
    import math
    from collections import Counter

    import pyarrow.parquet as pq

    B = 4096
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                      columns=["doc_id", "text"]).to_pydict()
    cnt: Counter = Counter()
    for i, x in zip(t["doc_id"], t["text"]):
        s = (x or "").lower()
        if len(s) < 3 or i % 10 >= 3:
            continue
        for k in range(len(s) - 2):
            g = s[k:k + 3]
            b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B
            cnt[("L", b)] += 1  # single-lang grouping is the worst case
    # audit per-lang too: group by real lang label
    langs = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                          columns=["doc_id", "lang", "text"]).to_pydict()
    per = Counter()
    tot = Counter()
    for i, lang, x in zip(langs["doc_id"], langs["lang"], langs["text"]):
        s = (x or "").lower()
        if len(s) < 3 or i % 10 >= 3:
            continue
        for k in range(len(s) - 2):
            b = int(hashlib.md5(s[k:k + 3].encode()).hexdigest()[:15], 16) % B
            per[(lang, b)] += 1
            tot[lang] += 1
    for (lang, b), c in per.items():
        x = 10**6 * math.log((c + 1) / (tot[lang] + B))
        assert abs(x - round(x)) > 1e-5, (lang, b, c, x)
    for lang, nl in tot.items():  # the smoothing floor operands
        x = 10**6 * math.log(1.0 / (nl + B))
        assert abs(x - round(x)) > 1e-5, (lang, nl, x)


def test_langid_confusion_partitions_the_predictions(spark, docs_df):
    """The confusion matrix must be a PARTITION of lang_id_trained's
    output: cell counts sum back to the per-(lang, pred) totals and to
    the overall scored-doc count, split by id%10<3 membership."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from bqetl_spark.functions.text import lang_id_trained

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    cells = em.queries()["langid_confusion"](spark, sf).collect()
    pred = lang_id_trained(docs).collect()
    assert sum(c["n"] for c in cells) == len(pred)
    from collections import Counter

    want = Counter()
    for r in pred:
        split = "train" if r["doc_id"] % 10 < 3 else "held_out"
        want[(r["lang"], r["pred_lang"], split)] += 1
    got = {(c["lang"], c["pred_lang"], c["split"]): c["n"] for c in cells}
    assert got == dict(want)
