"""Single-process pure-pandas oracle pipeline.

This defines correctness for the distributed engine (SURVEY.md §5.2): the
same extraction/linking/canonicalization rules run in one Python process.
The Spark path must produce byte-identical extracted text per url and
triple P/R >= 0.95; any divergence may come only from LSH blocking in
linking (the oracle links by brute-force cosine over ALL aliases).

Shares every scalar rule with the Spark UDFs via textops.py — there is no
second implementation to drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .textops import (
    EMBED_DIM,
    embed_many,
    extract_text,
    extract_triples,
    stable_id,
)

LINK_THRESHOLD = 0.60


def oracle_extract(pages: pd.DataFrame) -> pd.DataFrame:
    """pages(url, html) -> (url, text, error); exactly one row per page."""
    recs = []
    for url, html in zip(pages["url"], pages["html"]):
        text, err = extract_text(html)
        recs.append((url, text, err))
    return pd.DataFrame(recs, columns=["url", "text", "error"])


def oracle_triples(extracted: pd.DataFrame) -> pd.DataFrame:
    """(url, text) -> (url, sent_idx, subj, pred, obj) for good rows."""
    recs = []
    for url, text, err in zip(extracted["url"], extracted["text"], extracted["error"]):
        if err is not None:
            continue
        for t in extract_triples(text):
            recs.append((url, t.sent_idx, t.subj, t.pred, t.obj))
    return pd.DataFrame(recs, columns=["url", "sent_idx", "subj", "pred", "obj"])


def exact_alias_map(aliases: pd.DataFrame) -> dict[str, int]:
    """alias surface -> min entity_id (deterministic tie-break for shared
    aliases; the shared-alias edge itself is canonicalization's job)."""
    out: dict[str, int] = {}
    for eid, alias in zip(aliases["entity_id"], aliases["alias"]):
        eid = int(eid)
        if alias not in out or eid < out[alias]:
            out[alias] = eid
    return out


def oracle_link(
    mentions: list[str],
    aliases: pd.DataFrame,
    dim: int = EMBED_DIM,
    threshold: float = LINK_THRESHOLD,
) -> dict[str, int]:
    """Link each distinct mention surface to an entity id.

    1. exact dictionary match -> min entity_id for that alias
    2. else brute-force cosine against ALL alias embeddings; accept the
       best score >= threshold (ties -> min entity_id)
    3. else a deterministic fallback id (content-addressed, so re-runs and
       the Spark path agree)
    """
    amap = exact_alias_map(aliases)
    out: dict[str, int] = {}
    fuzzy: list[str] = []
    for m in dict.fromkeys(mentions):
        if m in amap:
            out[m] = amap[m]
        else:
            fuzzy.append(m)
    if fuzzy:
        amat = np.stack([np.asarray(v, dtype=np.float32) for v in aliases["embedding"]])
        eids = aliases["entity_id"].to_numpy(dtype=np.int64)
        q = embed_many(fuzzy, dim)  # rows already L2-normalized
        sims = q @ amat.T
        for i, m in enumerate(fuzzy):
            row = sims[i]
            best = float(row.max()) if row.size else -1.0
            if best >= threshold:
                cand = eids[row >= best - 1e-12]
                out[m] = int(cand.min())
            else:
                out[m] = stable_id("ent", m)
    return out


def union_find_canon(aliases: pd.DataFrame) -> dict[int, int]:
    """entity_id -> canonical id (min id in its connected component).

    Edges: two entity_ids sharing an alias surface. Plain union-find —
    the oracle for the Spark large-star/small-star implementation.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for eid in aliases["entity_id"]:
        find(int(eid))
    by_alias: dict[str, int] = {}
    for eid, alias in zip(aliases["entity_id"], aliases["alias"]):
        eid = int(eid)
        if alias in by_alias:
            union(by_alias[alias], eid)
        else:
            by_alias[alias] = eid
    # canonical = min member, which union() maintains as the root
    return {e: find(e) for e in list(parent)}


def oracle_pipeline(
    pages: pd.DataFrame,
    aliases: pd.DataFrame,
    dim: int = EMBED_DIM,
    threshold: float = LINK_THRESHOLD,
) -> dict[str, pd.DataFrame]:
    """Full oracle run -> dict of golden tables.

    Keys: extracted(url,text,error), triples(url,sent_idx,subj,pred,obj),
    linked(url,subj,pred,obj,subj_id,obj_id),
    canonical_triples(subj_canon,pred,obj_canon,cnt,sample_url),
    edges(src,dst,pred,cnt)
    """
    extracted = oracle_extract(pages)
    triples = oracle_triples(extracted)
    mentions = pd.unique(pd.concat([triples["subj"], triples["obj"]])).tolist()
    links = oracle_link(mentions, aliases, dim=dim, threshold=threshold)
    canon = union_find_canon(aliases)

    linked = triples.copy()
    linked["subj_id"] = [links[s] for s in linked["subj"]]
    linked["obj_id"] = [links[o] for o in linked["obj"]]
    linked["subj_canon"] = [canon.get(i, i) for i in linked["subj_id"]]
    linked["obj_canon"] = [canon.get(i, i) for i in linked["obj_id"]]

    canonical = (
        linked.groupby(["subj_canon", "pred", "obj_canon"], as_index=False)
        .agg(cnt=("url", "size"), sample_url=("url", "min"))
        .sort_values(["subj_canon", "pred", "obj_canon"])
        .reset_index(drop=True)
    )
    edges = (
        linked.groupby(["subj_canon", "obj_canon", "pred"], as_index=False)
        .agg(cnt=("url", "size"))
        .rename(columns={"subj_canon": "src", "obj_canon": "dst"})
        .sort_values(["src", "dst", "pred"])
        .reset_index(drop=True)
    )
    return {
        "extracted": extracted,
        "triples": triples,
        "linked": linked,
        "canonical_triples": canonical,
        "edges": edges,
    }


def prf(pred_set: set, truth_set: set) -> tuple[float, float]:
    """(precision, recall) of pred_set vs truth_set."""
    if not pred_set or not truth_set:
        return (0.0, 0.0)
    tp = len(pred_set & truth_set)
    return tp / len(pred_set), tp / len(truth_set)
