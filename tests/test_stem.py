"""Porter stemmer goldens (Porter 1980; expectations are full-pipeline
outputs matching the canonical reference implementation) + the stemming
analyzer's index behavior."""

import numpy as np
import pandas as pd
import pytest

from fatespark.analysis import ANALYZERS, porter_tokens
from fatespark.stem import porter_stem, stem_array, stem_series

GOLDEN = {
    # step 1a/1b/1c
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "running": "run", "runs": "run", "easily": "easili",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_goldens():
    bad = {w: (porter_stem(w), want) for w, want in GOLDEN.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_short_nonalpha_passthrough():
    for w in ["a", "is", "42", "x1y", "foo_bar", "Любовная", ""]:
        assert porter_stem(w) == w


def test_stem_array_matches_scalar():
    toks = np.array(["running", "runs", "the", "running", "ponies"],
                    dtype=object)
    out = stem_array(toks)
    assert out.tolist() == [porter_stem(t) for t in toks]
    s = stem_series(pd.Series(toks))
    assert s.tolist() == out.tolist()


def test_porter_analyzer_registered():
    tok, off = ANALYZERS["porter"]
    assert tok("Running RUNS ponies") == ["run", "run", "poni"]
    # offsets identical to whitespace (stemming moves no token starts)
    ws_off = ANALYZERS["whitespace"][1]
    assert off("a bb  ccc") == ws_off("a bb  ccc")


def test_porter_tokens_idempotent_under_fold():
    # segment build folds before tokenizing; must not change the stream
    from fatespark.analysis import ascii_fold
    text = "Conflated Hopping SIZED"
    assert porter_tokens(ascii_fold(text)) == porter_tokens(text)



def test_index_with_porter_analyzer(spark, tmp_root):
    from fatespark.build import BuildConfig, IndexBuilder
    from fatespark.query import SearchIndex

    docs = spark.createDataFrame(
        [(1, "the dog was running fast"),
         (2, "three dogs run daily"),
         (3, "a cat sat still")],
        "doc_id long, text string")
    d = str(tmp_root / "porter_idx")
    IndexBuilder(d, BuildConfig(n_buckets=2, salt_bits=0,
                                analyzer="porter")).build(
        spark, docs, id_col="doc_id", url_col="doc_id", build_id="p")
    idx = SearchIndex(spark, d)
    # 'running' and 'run(s)' conflate to the same term
    assert idx.count("running") == 2
    assert idx.count("runs") == 2
    hits = {r["doc_id"] for r in idx.search(["running"], k=10, mode="OR")
            .collect()}
    assert hits == {1, 2}
