"""Extraction operators: the main Arrow UDF chain (SURVEY.md §2.12).

The heavy per-document logic lives in kernels/extract_doc.py; this module
is only the Arrow plumbing: pandas batches in, struct columns out. One
fused UDF performs sniff -> branch extract -> normalize -> rotate ->
date-split -> order -> assemble per document, avoiding span-array
serialization between stages (the reference's §3.1 chain is per-doc
sequential anyway, so fusing loses no parallelism and saves Arrow round
trips at 10^12-row scale).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import bbox_core as bc
from ..kernels.extract_doc import ExtractResult, extract_document
from ..schema import COORD_FIELDS, SPAN_COLUMNS, SPAN_STRUCT, SPANS_ARRAY

EXTRACT_STRUCT = T.StructType(
    [
        T.StructField("spans", SPANS_ARRAY),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("doc_rotation", T.IntegerType()),
        T.StructField("tilt_angle", T.DoubleType()),
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("provider", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("extract_ms", T.DoubleType()),
    ]
)


def spans_to_records(res: ExtractResult, label: str | None = None) -> list[dict]:
    """ExtractResult -> list of span-struct dicts (normalized coords)."""
    coords = res.coords.tolist()
    out = []
    for i, row in enumerate(coords):
        rec = dict(zip(COORD_FIELDS, row))
        rec["in_pixels"] = False
        rec["text"] = res.texts[i]
        rec["label"] = label
        rec["confidence"] = float(res.confidences[i]) if i < len(res.confidences) else None
        out.append(rec)
    return out


def records_to_arrays(spans: list[dict]) -> tuple[np.ndarray, list[str], list[float]]:
    """Span-struct dicts -> (coords (n,8), texts, confidences)."""
    n = len(spans)
    coords = np.empty((n, 8), dtype=np.float64)
    texts: list[str] = []
    confs: list[float] = []
    for i, s in enumerate(spans):
        for j, c in enumerate(COORD_FIELDS):
            coords[i, j] = s[c]
        texts.append(s["text"])
        confs.append(s["confidence"] if s["confidence"] is not None else 0.0)
    return coords, texts, confs


@F.pandas_udf(EXTRACT_STRUCT)
def extract_udf(html: pd.Series, lang: pd.Series) -> pd.DataFrame:
    """Vectorized batch driver for extract_document (no per-row Python UDFs:
    this is one Arrow batch per call, numpy kernels inside)."""
    spans_col, text_col, rot_col, tilt_col, n_col, prov_col, err_col, ms_col = (
        [],
        [],
        [],
        [],
        [],
        [],
        [],
        [],
    )
    for payload, lg in zip(html.tolist(), lang.tolist()):
        t0 = time.perf_counter()
        res = extract_document(payload, lg)
        ms = (time.perf_counter() - t0) * 1000.0
        spans_col.append(spans_to_records(res))
        text_col.append(res.extracted_text)
        rot_col.append(res.rotation)
        tilt_col.append(res.tilt_angle)
        n_col.append(len(res.texts))
        prov_col.append(res.provider)
        err_col.append(res.error)
        ms_col.append(ms)
    return pd.DataFrame(
        {
            "spans": spans_col,
            "extracted_text": text_col,
            "doc_rotation": pd.array(rot_col, dtype="int32"),
            "tilt_angle": tilt_col,
            "n_spans": pd.array(n_col, dtype="int32"),
            "provider": prov_col,
            "error": err_col,
            "extract_ms": ms_col,
        }
    )


def with_extraction_pandas(df, html_col: str = "html", lang_col: str = "lang"):
    """pandas-UDF variant (kept for API parity / comparison benchmarks)."""
    out = df.withColumn("_x", extract_udf(F.col(html_col), F.col(lang_col)))
    for field in EXTRACT_STRUCT.fieldNames():
        out = out.withColumn(field, F.col(f"_x.{field}"))
    return out.drop("_x")


def _extract_batch_arrow(batch, html_idx: int, lang_idx: int, text_idx: int | None = None,
                         mode: str = "single"):
    """One Arrow batch -> extraction columns as native Arrow arrays.

    Builds the span list<struct> column zero-copy from numpy buffers
    (8 coord children from one concatenated (total_spans, 8) array)
    instead of per-span Python dicts — this is the serialization hot
    path at 10^12 rows."""
    import pyarrow as pa

    from ..kernels.extract_doc import extract_consensus, extract_dual, extract_with_aux

    payloads = batch.column(html_idx).to_pylist()
    langs = batch.column(lang_idx).to_pylist()
    texts_in = batch.column(text_idx).to_pylist() if text_idx is not None else None
    n = len(payloads)

    coord_blocks: list[np.ndarray] = []
    flat_texts: list[str] = []
    flat_conf: list[float] = []
    offsets = np.zeros(n + 1, dtype=np.int32)
    text_col: list[str] = []
    rot_col = np.zeros(n, dtype=np.int32)
    tilt_col = np.zeros(n, dtype=np.float64)
    nsp_col = np.zeros(n, dtype=np.int32)
    prov_col: list[str] = []
    err_col: list[str | None] = []
    ms_col = np.zeros(n, dtype=np.float64)

    for i in range(n):
        t0 = time.perf_counter()
        if mode == "dual":
            res = extract_dual(payloads[i], langs[i], texts_in[i])
        elif mode.startswith("consensus"):
            res = extract_consensus(payloads[i], langs[i], _consensus_n(mode))
        elif mode == "aux":
            res = extract_with_aux(payloads[i], langs[i])
        else:
            res = extract_document(payloads[i], langs[i])
        ms_col[i] = (time.perf_counter() - t0) * 1000.0
        k = len(res.texts)
        offsets[i + 1] = offsets[i] + k
        if k:
            coord_blocks.append(res.coords)
            flat_texts.extend(res.texts)
            flat_conf.extend(res.confidences)
        text_col.append(res.extracted_text)
        rot_col[i] = res.rotation
        tilt_col[i] = res.tilt_angle
        nsp_col[i] = k
        prov_col.append(res.provider)
        err_col.append(res.error)

    total = int(offsets[-1])
    coords = np.vstack(coord_blocks) if coord_blocks else np.zeros((0, 8))
    children = [pa.array(np.ascontiguousarray(coords[:, j])) for j in range(8)]
    children.append(pa.array(np.zeros(total, dtype=bool)))  # in_pixels
    children.append(pa.array(flat_texts, type=pa.string()))
    children.append(pa.nulls(total, pa.string()))  # label
    children.append(pa.array(np.asarray(flat_conf, dtype=np.float64)))
    span_struct = pa.StructArray.from_arrays(children, names=SPAN_COLUMNS)
    spans = pa.ListArray.from_arrays(pa.array(offsets), span_struct)

    return [
        spans,
        pa.array(text_col, type=pa.string()),
        pa.array(rot_col),
        pa.array(tilt_col),
        pa.array(nsp_col),
        pa.array(prov_col, type=pa.string()),
        pa.array(err_col, type=pa.string()),
        pa.array(ms_col),
    ]


def _prefetched(batches, depth: int = 1):
    """Wrap the Arrow batch iterator with a reader thread + bounded queue
    so the JVM can produce batch n+1 (socket I/O, parquet decode) while
    Python computes batch n. The reader blocks in the socket read with
    the GIL released; measured ~62% worker duty without it at 32 cores
    (BENCH/BASELINE.md §1). depth=1 bounds per-task memory to two
    in-flight batches (at 100 KB real-web pages: ~200 MB/task upper
    bound with 1024-row batches — tune SPARK_GRAFT_ARROW_BATCH down for
    fatter pages)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def reader():
        # timeout-based put + stop event so an abandoned consumer (task
        # kill, downstream exception) releases this thread and the
        # underlying Arrow stream instead of blocking in q.put forever
        # in a reused daemon worker
        try:
            for b in batches:
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_END)
        except BaseException as exc:  # propagate into the consumer
            # retry until delivered or the consumer is gone — dropping
            # the exception would leave the consumer blocked in q.get()
            # forever (no _END ever arrives)
            while not stop.is_set():
                try:
                    q.put(exc, timeout=0.5)
                    break
                except queue.Full:
                    continue

    threading.Thread(target=reader, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # unblock a reader waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break


def _map_in_arrow(df, html_col: str, lang_col: str, text_col: str | None, keep_payload: bool,
                  mode: str = "single"):
    import pyarrow as pa

    in_schema = df.schema
    html_idx = in_schema.fieldNames().index(html_col)
    lang_idx = in_schema.fieldNames().index(lang_col)
    text_idx = in_schema.fieldNames().index(text_col) if text_col else None

    # Do NOT pass the html payload (or the provider text column) back out
    # of the Python stage: every output column is Arrow-decoded and
    # row-converted again JVM-side, and the payload is the widest column
    # by far. Downstream consumers (cache, results, metrics) never need it.
    drop = set() if keep_payload else {html_col} | ({text_col} if text_col else set())
    kept = [(i, f) for i, f in enumerate(in_schema.fields) if f.name not in drop]
    out_schema = T.StructType([f for _, f in kept] + EXTRACT_STRUCT.fields)
    out_names = [f.name for _, f in kept] + EXTRACT_STRUCT.fieldNames()
    kept_idx = [i for i, _ in kept]

    import os

    depth = int(os.environ.get("SPARK_GRAFT_PREFETCH_DEPTH", "1"))

    def op(batches):
        for batch in _prefetched(batches, depth=depth):
            new_cols = _extract_batch_arrow(batch, html_idx, lang_idx, text_idx, mode)
            arrays = [batch.column(i) for i in kept_idx] + new_cols
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return df.mapInArrow(op, schema=out_schema)


def with_extraction(df, html_col: str = "html", lang_col: str = "lang", keep_payload: bool = False):
    """Fused extraction via mapInArrow: non-payload input columns pass
    through zero-copy, extraction columns appended as native Arrow
    arrays; the html payload is dropped on output (set keep_payload to
    retain it)."""
    return _map_in_arrow(df, html_col, lang_col, None, keep_payload)


def _consensus_n(mode: str) -> int:
    """'consensus' -> 2 (reference ocr_samples default); 'consensus3' -> 3."""
    suffix = mode[len("consensus"):]
    return int(suffix) if suffix else 2


def with_consensus_extraction(df, html_col: str = "html", lang_col: str = "lang",
                              keep_payload: bool = False, n_samples: int = 2):
    """Multi-sample consensus extraction (reference D5 flow; default 2
    samples like ocr_samples=2, n-way supported via aggregate_samples_n)."""
    mode = "consensus" if n_samples == 2 else f"consensus{n_samples}"
    return _map_in_arrow(df, html_col, lang_col, None, keep_payload, mode=mode)


def with_dual_extraction(df, html_col: str = "html", lang_col: str = "lang", text_col: str = "text",
                         keep_payload: bool = False):
    """Dual-provider (GoogleAzure-analogue) extraction: primary branch
    extractor + provider-text secondary, combined per document (J2 + J4,
    constant confidence 0.9)."""
    return _map_in_arrow(df, html_col, lang_col, text_col, keep_payload, mode="dual")


def with_aux_extraction(df, html_col: str = "html", lang_col: str = "lang",
                        keep_payload: bool = False):
    """Extraction + auxiliary checkbox spans (reference checkbox detector
    flow: detect ☑/☐ elements, suppress overlapped words, merge in
    reading order — kernels/checkbox_detect.py + combine.py F6/J4)."""
    return _map_in_arrow(df, html_col, lang_col, None, keep_payload, mode="aux")


# ---------------------------------------------------------------------------
# stage-level UDFs (exposed for the combiner, tests, and API parity with the
# reference's composable post-processing; same kernels, smaller scopes)
# ---------------------------------------------------------------------------


@F.pandas_udf(SPANS_ARRAY)
def normalize_spans_udf(spans: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    """§1.4 canonicalization + to_normalized per span array."""
    out = []
    for recs, w, h in zip(spans.tolist(), width.tolist(), height.tolist()):
        if recs is None or len(recs) == 0:
            out.append([])
            continue
        coords, texts, confs = records_to_arrays(recs)
        coords = bc.to_normalized(coords, int(w), int(h))
        res = []
        for i, row in enumerate(coords.tolist()):
            rec = dict(zip(COORD_FIELDS, row))
            rec["in_pixels"] = False
            rec["text"] = texts[i]
            rec["label"] = recs[i].get("label")
            rec["confidence"] = confs[i]
            res.append(rec)
        out.append(res)
    return pd.Series(out)


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def order_spans_udf(spans: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    """Reading-order index array per document (O1)."""
    from ..kernels.order import reading_order_indices

    out = []
    for recs, w, h in zip(spans.tolist(), width.tolist(), height.tolist()):
        if recs is None or len(recs) == 0:
            out.append([])
            continue
        coords, texts, _ = records_to_arrays(recs)
        out.append([int(i) for i in reading_order_indices(coords, texts, int(w), int(h))])
    return pd.Series(out)


def extract_documents_fused(spark, sf_dir: str, mode: str = "single", docs_filter=None):
    """documents.parquet -> extraction results in ONE Python stage:
    page synthesis (test scaffolding) and extraction run in the same
    Arrow batch, skipping the intermediate pages hop and the span-array
    serialization (correctness queries don't read spans).

    ``docs_filter`` (optional Column predicate) is applied BEFORE the
    repartition so slice queries push it into the parquet scan instead
    of extracting everything and discarding 90% afterwards.

    Production reads a real pages table (see plans/pipeline.py); this is
    the fast path for the documents-derived correctness/bench queries.
    """
    import pandas as pd

    from ..kernels.extract_doc import (
        extract_consensus,
        extract_document,
        extract_dual,
        extract_with_aux,
    )
    from ..sources.pages import build_page_rows

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if docs_filter is not None:
        docs = docs.filter(docs_filter)
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")

    def op(batches):
        for pdf in batches:
            pages = build_page_rows(pdf)
            out = {
                "doc_id": pdf["doc_id"].to_numpy(dtype="int64"),
                "url": pages["url"],
                "extracted_text": [],
                "n_spans": [],
                "provider": [],
                "doc_rotation": [],
                "tilt_angle": [],
                "error": [],
            }
            for payload, lang, text in zip(pages["html"], pages["lang"], pages["text"]):
                if mode == "dual":
                    res = extract_dual(payload, lang, text)
                elif mode.startswith("consensus"):
                    res = extract_consensus(payload, lang, _consensus_n(mode))
                elif mode == "aux":
                    res = extract_with_aux(payload, lang)
                else:
                    res = extract_document(payload, lang)
                out["extracted_text"].append(res.extracted_text)
                out["n_spans"].append(len(res.texts))
                out["provider"].append(res.provider)
                out["doc_rotation"].append(res.rotation)
                out["tilt_angle"].append(res.tilt_angle)
                out["error"].append(res.error)
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        op,
        schema=(
            "doc_id long, url string, extracted_text string, n_spans int, "
            "provider string, doc_rotation int, tilt_angle double, error string"
        ),
    )


@F.pandas_udf(SPANS_ARRAY)
def postprocess_spans_udf(spans: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
    """Stage-level post-processing over a spans column (SURVEY.md §2.12
    UDF #4): the primary-provider filters first (F1 vertical-box + F2
    date-run, reference google_azure_ocr.py:406-440), then the date-range
    split (C1) — the reference's order: filters clean the raw provider
    boxes, the split then produces the canonical [date, "-", date]
    triple (running F2 after C1 would delete what C1 just built).
    Composable with normalize_spans_udf / order_spans_udf."""
    from ..kernels import clean

    out = []
    for recs, w, h in zip(spans.tolist(), width.tolist(), height.tolist()):
        if recs is None or len(recs) == 0:
            out.append([])
            continue
        coords, texts, confs = records_to_arrays(recs)
        wh_ratio = (int(w) / int(h)) if int(h) else 1.0
        f_coords, f_texts = clean.filter_unwanted_boxes(coords, texts, wh_ratio)
        conf_by_key = {(tuple(coords[i]), texts[i]): confs[i] for i in range(len(texts))}
        f_confs = [conf_by_key.get((tuple(f_coords[i]), f_texts[i]), 0.0) for i in range(len(f_texts))]
        kept_coords, kept_texts, kept_confs = clean.split_date_boxes(f_coords, f_texts, f_confs)
        conf_map = {(tuple(kept_coords[i]), kept_texts[i]): kept_confs[i] for i in range(len(kept_texts))}
        res = []
        for i, row in enumerate(kept_coords.tolist()):
            rec = dict(zip(COORD_FIELDS, row))
            rec["in_pixels"] = False
            rec["text"] = kept_texts[i]
            rec["label"] = None
            rec["confidence"] = conf_map.get((tuple(kept_coords[i]), kept_texts[i]), 0.0)
            res.append(rec)
        out.append(res)
    return pd.Series(out)


def assemble_text_col(spans_col: Column) -> Column:
    """A6 text assembly as a pure JVM expression (no UDF): space-joined
    span texts (reference ocr_wrapper.py:283-289). NULL-safe for empty
    arrays."""
    return F.array_join(F.transform(spans_col, lambda s: s["text"]), " ")
