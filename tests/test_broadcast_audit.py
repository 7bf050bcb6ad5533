"""Source-level broadcast-hint audit (round-14, per the r13 verdict).

The one 100 TB scale-killer class left on the books in round 13 was a
FORCED ``F.broadcast(...)`` hint on a frame that is vocabulary-sized —
i.e. derived from a ``groupBy``/``distinct`` over an exploded corpus
token stream, which grows without bound with corpus size and OOMs
executors when force-broadcast at scale. The BM25 fix
(``operators/text.py`` — ``dfreq`` semi-joined to the <=8 query terms
BEFORE the hint) is the model for when such a hint IS legitimate: the
frame must be bounded by construction before the hint is applied.

This test makes the rule mechanical: it AST-scans every
``F.broadcast(<arg>)`` call in the engine source, traces the argument's
lineage through same-function local assignments, and FLAGS the site if
the lineage reaches a ``.groupBy(``/``.distinct()`` over an exploded
token stream (``explode``/``posexplode``/``exploded_shingles``/
``tokens_col``/``split(``) — unless either:

- some assignment on the path is a global aggregate (``.agg(`` with no
  ``.groupBy(``) — a 1-row scalar frame, bounded by construction; or
- the site is in ``BOUNDED_OK`` below, each entry carrying the reviewed
  reason the frame is bounded (top-k filter, heavy-hitter cap,
  query-term semi-join, ...).

Any NEW forced broadcast of a vocabulary-derived frame therefore fails
CI until a human classifies it here.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

import pytest

ENGINE_DIR = Path(__file__).resolve().parents[1] / "jaffle_shop_classic_spark"

SOURCES = sorted(
    p
    for p in ENGINE_DIR.rglob("*.py")
    if p.name != "__init__.py"
)

# (module, function, broadcast-arg root variable) -> why the frame is
# bounded even though its lineage touches a token-stream groupBy.
BOUNDED_OK = {
    # BM25 / RM3: df table is semi-joined to the <=8 query terms BEFORE
    # the hint (the round-13 fix this audit generalizes).
    ("text", "q_retrieval_bm25_topk", "dfreq_q"): "semi-joined to <=8 query terms",
    ("text", "q_retrieval_rm3_expansion", "dfreq_q"): "semi-joined to bounded q+fb terms",
    ("text", "q_retrieval_rm3_expansion", "fb"): "top-FB_DOCS feedback docs (row_number <= k)",
    # vocab gated to the top-K ranked rows before the hint
    ("text", "q_vocab_oov_rate", "vocab"): "row_number filter rn <= VOCAB_TOP_K",
    # hot-shingle list: df >= BOILER_DF_FRAC * N keeps at most
    # avg_shingles_per_doc / frac rows — constant in corpus size
    ("text", "q_text_boilerplate_shingles", "hot"): "heavy-hitter df cap bounds row count",
    # Misra-Gries candidates: <= MG_K entries per input partition
    ("text", "q_text_heavy_hitters_mg", "cands"): "MG summary capacity bound",
    # hybrid RRF: per-query weights for ONE query doc (doc_id == 0)
    ("similarity", "q_hybrid_retrieval_rrf", "qw"): "single query document's terms",
    # BM25 query-term frame: row_number filter rn <= BM25_QUERY_TERMS (=8)
    ("text", "q_retrieval_bm25_topk", "q"): "row_number filter <= BM25_QUERY_TERMS",
    # groupBy over a BOUNDED key domain (not the vocabulary):
    ("mining", "q_source_vocab_overlap", "sa"): "groupBy(source): #sources rows",
    ("mining", "q_source_vocab_overlap", "sb"): "groupBy(source): #sources rows",
    ("mining", "q_sketch_cms_frequencies", "sketch"): "CMS_DEPTH x CMS_WIDTH cells",
    ("text", "q_source_kl_divergence", "totals"): "groupBy(source): #sources rows",
    ("text", "q_sample_dsir_importance", "wt"): "<= DSIR_BUCKETS hash-bucket rows",
    # k-means / PQ codebooks: K (resp. M x K) centroid rows
    ("similarity", "_train_kmeans_centroids", "cent"): "K centroid rows",
    ("similarity", "_pq_codebooks", "cent"): "M x K codebook rows",
    # Ljung-Box statistic: 1-row frame; the lineage 'explode' is a
    # 7-element literal lag array, not a corpus token stream
    ("mining", "q_stats_ljung_box", "lb"): "1-row LB statistic frame",
}

_TOKEN_SOURCE = re.compile(r"explode|exploded_shingles|tokens_col|split\(")


def _module_broadcast_sites(path: Path):
    src = path.read_text()
    tree = ast.parse(src)
    sites = []
    for fn in [n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]:
        # accumulate EVERY assignment segment per name (not just the
        # last): the self-reassignment idiom `gv = gv.localCheckpoint()`
        # would otherwise erase the upstream groupBy/explode text and
        # let a vocabulary-derived broadcast slip past the audit
        assigns: dict[str, list[str]] = {}
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                t = node.targets[0]
                seg = ast.get_source_segment(src, node.value) or ""
                if isinstance(t, ast.Name):
                    assigns.setdefault(t.id, []).append(seg)
                elif isinstance(t, ast.Tuple):
                    for el in t.elts:
                        if isinstance(el, ast.Name):
                            assigns.setdefault(el.id, []).append(seg)
        for node in ast.walk(fn):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "F"
                and node.args
            ):
                arg_src = ast.get_source_segment(src, node.args[0]) or ""
                sites.append((fn.name, node.lineno, arg_src, assigns))
    return sites


def _lineage(arg_src: str, assigns: dict[str, list[str]]) -> tuple[str, str]:
    """Expand local names reachable from the broadcast arg.

    Returns (root_name, concatenated lineage text). Every assignment
    segment a name ever held is unioned (a reassignment must not hide
    its upstream text); expansion stops at any segment that is a global
    aggregate or an explicit limit (1-row/bounded by construction).
    """
    names = re.findall(r"[A-Za-z_][A-Za-z0-9_]*", arg_src)
    root = next((n for n in names if n in assigns), arg_src)
    seen: set[str] = set()
    frontier = [n for n in names if n in assigns]
    texts = [arg_src]
    while frontier:
        n = frontier.pop()
        if n in seen:
            continue
        seen.add(n)
        for seg in assigns[n]:
            if ".agg(" in seg and ".groupBy(" not in seg:
                continue  # 1-row scalar frame: bounded by construction
            if ".limit(" in seg:
                continue  # explicit row cap: bounded by construction
            texts.append(seg)
            frontier.extend(
                m for m in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", seg) if m in assigns
            )
    return root, "\n".join(texts)


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(ENGINE_DIR)))
def test_no_unbounded_vocabulary_broadcasts(path):
    offenders = []
    mod = path.stem
    for fn_name, lineno, arg_src, assigns in _module_broadcast_sites(path):
        root, lineage = _lineage(arg_src, assigns)
        vocab_derived = (
            ".groupBy(" in lineage or ".distinct()" in lineage
        ) and _TOKEN_SOURCE.search(lineage)
        if vocab_derived and (mod, fn_name, root) not in BOUNDED_OK:
            offenders.append(f"{path.name}:{lineno} {fn_name}: F.broadcast({arg_src})")
    assert not offenders, (
        "forced broadcast of a vocabulary-derived frame (OOMs at 100 TB); "
        "either drop the hint (AQE decides) or bound the frame first and "
        "add a reviewed BOUNDED_OK entry:\n" + "\n".join(offenders)
    )
