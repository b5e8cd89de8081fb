"""Winnowing fingerprint dedup and language-mix profile tests: full
python replicas from the parquet bytes plus planted-corpus semantics
(exact-dup pair recovery, short-doc exclusion, injected code-switch
paragraph, uniform-language control)."""

from __future__ import annotations

import hashlib

import pandas as pd

from tests.conftest import SF_SMOKE


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["lang"] = "en"
    pdf["source"] = "test"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _winnow_fps(text: str):
    from ocr_wrapper_spark.fingerprint_queries import (
        WINNOW_K,
        WINNOW_MIN_TOKENS,
        WINNOW_W,
    )

    tk = text.split(" ")
    n = len(tk)
    if n < WINNOW_MIN_TOKENS:
        return set()
    grams = [
        hashlib.md5(" ".join(tk[i : i + WINNOW_K]).encode()).hexdigest()[:8]
        for i in range(n - WINNOW_K + 1)
    ]
    return {min(grams[j : j + WINNOW_W]) for j in range(len(grams) - WINNOW_W + 1)}


def _winnow_pairs(docs):
    from ocr_wrapper_spark.fingerprint_queries import WINNOW_MAX_DF, WINNOW_SHARED_T

    per_fp = {}
    for doc_id, text in docs:
        for fp in _winnow_fps(text):
            per_fp.setdefault(fp, []).append(doc_id)
    pairs = {}
    for fp, ids in per_fp.items():
        if len(ids) > WINNOW_MAX_DF:
            continue
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                key = (min(a, b), max(a, b))
                pairs[key] = pairs.get(key, 0) + 1
    return {k: v for k, v in pairs.items() if v >= WINNOW_SHARED_T}


def test_winnowing_python_replica_smoke(spark):
    from ocr_wrapper_spark.fingerprint_queries import dedup_winnowing

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    expect = _winnow_pairs([(int(r.doc_id), r.text) for r in docs.itertuples()])
    got = {
        (r.id_a, r.id_b): r.n_shared for r in dedup_winnowing(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect  # the corpus's planted duplicates must surface


def test_winnowing_exact_dup_pair_and_short_doc_exclusion(spark, tmp_path):
    from ocr_wrapper_spark.fingerprint_queries import (
        WINNOW_MIN_TOKENS,
        dedup_winnowing,
    )

    long_text = " ".join(f"tok{i}" for i in range(30))
    short = " ".join(f"s{i}" for i in range(WINNOW_MIN_TOKENS - 1))
    sf = _write_docs(tmp_path, [(1, long_text), (2, long_text), (3, short), (4, short)])
    rows = dedup_winnowing(spark, sf).collect()
    pairs = {(r.id_a, r.id_b): r.n_shared for r in rows}
    assert set(pairs) == {(1, 2)}  # short docs carry no full window
    assert pairs[(1, 2)] == len(_winnow_fps(long_text))  # every fp shared


def test_winnowing_guarantee_on_long_shared_run(spark, tmp_path):
    """Two docs sharing a long token run (with distinct surroundings)
    must be paired — the winnowing coverage guarantee at the pair
    grain."""
    from ocr_wrapper_spark.fingerprint_queries import dedup_winnowing

    shared = " ".join(f"core{i}" for i in range(40))
    a = " ".join(f"pre{i}" for i in range(10)) + " " + shared
    b = shared + " " + " ".join(f"post{i}" for i in range(10))
    sf = _write_docs(tmp_path, [(1, a), (2, b)])
    pairs = {(r.id_a, r.id_b) for r in dedup_winnowing(spark, sf).collect()}
    assert (1, 2) in pairs


# ---------------------------------------------------------------------------
# language-mix profile
# ---------------------------------------------------------------------------


def _mix_replica(docs):
    from ocr_wrapper_spark.fingerprint_queries import (
        _MIX_ALL,
        _MIX_LANGS,
        _N_ALL,
        _N_MIX,
        CS_THRESHOLD_PPM,
        MIX_INJECT_PARA,
        MIX_MOD,
        MIX_PARA_WORDS,
        MIX_RES,
    )
    from ocr_wrapper_spark.operators.textstats import LANG_MARKERS

    out = {}
    for doc_id, text in docs:
        if text == "":
            continue
        if doc_id % MIX_MOD == MIX_RES:
            text = text + " " + MIX_INJECT_PARA
        tk = text.split(" ")
        counts = {}
        for s in range(0, len(tk), MIX_PARA_WORDS):
            para = tk[s : s + MIX_PARA_WORDS]
            best = max(
                sum(1 for t in para if t in LANG_MARKERS[lang]) * _N_MIX + rank
                for rank, lang in enumerate(_MIX_LANGS)
            )
            guess = _MIX_LANGS[best % _N_MIX] if best // _N_MIX > 0 else "und"
            counts[guess] = counts.get(guess, 0) + 1
        n_paras = sum(counts.values())
        ss = sum(c * c for c in counts.values())
        enc = max(c * _N_ALL + _MIX_ALL.index(l) for l, c in counts.items())
        simpson = 1_000_000 - (ss * 1_000_000) // (n_paras * n_paras)
        out[doc_id] = (
            n_paras,
            _MIX_ALL[enc % _N_ALL],
            simpson,
            simpson >= CS_THRESHOLD_PPM,
        )
    return out


def test_lang_mix_python_replica_smoke(spark):
    from ocr_wrapper_spark.fingerprint_queries import doc_lang_mix

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    expect = _mix_replica([(int(r.doc_id), r.text) for r in docs.itertuples()])
    got = {
        r.doc_id: (r.n_paras, r.dominant_lang, r.simpson_ppm, r.code_switched)
        for r in doc_lang_mix(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert any(v[3] for v in got.values())  # injected paragraphs flag rows


def test_lang_mix_injected_paragraph_and_uniform_control(spark, tmp_path):
    from ocr_wrapper_spark.fingerprint_queries import doc_lang_mix

    en = "the and of to " * 5  # 20 english marker tokens
    sf = _write_docs(
        tmp_path,
        [(6, en.strip()), (1, (en + en).strip())],  # 6 % 13 == 6 gains a DE para
    )
    got = {r.doc_id: r for r in doc_lang_mix(spark, sf).collect()}
    mixed = got[6]
    # one en paragraph + one injected de paragraph: Simpson = 1 - 2/4
    assert (mixed.n_paras, mixed.simpson_ppm, mixed.code_switched) == (2, 500_000, True)
    assert mixed.dominant_lang == "en"  # tie breaks to the larger code
    ctrl = got[1]
    assert (ctrl.n_paras, ctrl.dominant_lang, ctrl.simpson_ppm, ctrl.code_switched) == (
        2,
        "en",
        0,
        False,
    )
