"""Deterministic synthetic fixtures: the `pages` table (BASELINE.json
input_hint shape) and the `aliases` entity-linking dictionary.

Everything is seeded (seed=42 convention, matching /root/testdata). The
generator builds html FROM the ground-truth text, so
``textops.extract_text(html) == text`` holds byte-for-byte by construction
(FIXTURES.md §1), and body sentences come from a closed grammar over a known
entity/relation vocabulary so ground-truth mentions/triples are computable
exactly.

Reference analog: these pages play the role of the reference's Kafka topic
of (id, text, payload) JSON records
(/root/reference/internal/app/sources/kafka/fetch_messages.go:33-35); the
alias dictionary plays the role of the Qdrant collection the reference
queries against (/root/reference/internal/app/storages/qdrant/store.go:99).
"""

from __future__ import annotations

import html as _htmlmod
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from .textops import EMBED_DIM, PREDICATE_PHRASES, embed_string

SEED = 42

_ADJ = [
    "Quantum", "Stellar", "Crimson", "Vertex", "Atlas", "Nimbus", "Aurora",
    "Obsidian", "Cobalt", "Zenith", "Meridian", "Pinnacle", "Cascade",
    "Horizon", "Ember", "Granite", "Velvet", "Solstice", "Borealis", "Onyx",
]
_NOUN = [
    "Dynamics", "Systems", "Analytics", "Robotics", "Networks", "Industries",
    "Logistics", "Biotech", "Energy", "Capital", "Materials", "Semiconductors",
    "Software", "Aerospace", "Pharma", "Media", "Foods", "Mobility",
    "Security", "Labs",
]
_SUFFIX = ["Corp", "Inc", "Group", "Holdings", "Partners", "Ltd", "AG", "LLC"]

_FILLER = [
    "The quarterly report shows steady growth across all regions.",
    "Analysts expect further consolidation in the sector next year.",
    "Shares rose two percent in early trading on Monday.",
    "The announcement follows months of speculation in the press.",
    "Regulators have not yet commented on the pending review.",
    "A spokesperson declined to give further details.",
    "Revenue guidance was reaffirmed for the fiscal year.",
    "The board will meet again in the third quarter.",
    "Supply chain pressures eased during the period.",
    "Customer demand remained resilient despite headwinds.",
]

_LANGS = ["en", "es", "zh", "de", "fr"]

PRED_LIST = [p for _, p in PREDICATE_PHRASES]
_PHRASE_BY_PRED = {p: s for s, p in PREDICATE_PHRASES}

# Share of subject mentions forced onto the hub entity (FIXTURES.md §2:
# one hub entity owns >=30% of mentions — exercises salted-key CC / skew).
HUB_SHARE = 0.32
# Share of mentions emitted as a noisy surface form absent from the alias
# dict — exercises the fuzzy (LSH + cosine) linking path.
NOISE_SHARE = 0.04

HUB_ENTITY = 1


def n_entities_for(n_pages: int) -> int:
    return max(40, n_pages // 50)


def gen_aliases(n_entities: int, seed: int = SEED, dim: int = EMBED_DIM) -> pd.DataFrame:
    """Alias dictionary: (entity_id, alias, embedding).

    - Each entity gets its canonical name, a short form, and an
      abbreviation.
    - Every 10th entity pair (10k+2, 10k+3) SHARES the short form ->
      canonicalization must merge them (connected components does real work).
    """
    rng = np.random.default_rng(seed)
    rows: list[tuple[int, str]] = []
    names: list[str] = []
    seen: set[str] = set()
    for eid in range(1, n_entities + 1):
        # the raw combo space is |ADJ|x|NOUN|x|SUFFIX| = 3200; for larger
        # dictionaries disambiguate deterministically with the entity id
        # (never loop forever hunting a free combo)
        for _attempt in range(5):
            name = (
                f"{_ADJ[rng.integers(len(_ADJ))]} "
                f"{_NOUN[rng.integers(len(_NOUN))]} "
                f"{_SUFFIX[rng.integers(len(_SUFFIX))]}"
            )
            if name not in seen:
                break
        else:
            name = f"{name} {eid}"
        seen.add(name)
        names.append(name)
        parts = name.split(" ")
        short = " ".join(parts[:2])
        abbrev = "".join(w[0] for w in parts) + str(eid % 97)
        rows.append((eid, name))
        rows.append((eid, abbrev))
        # duplicate-entity fixture: odd member of each pair borrows the
        # even member's short form instead of its own
        if eid % 10 == 3 and eid >= 3:
            prev_short = " ".join(names[eid - 2].split(" ")[:2])
            rows.append((eid, prev_short))
        else:
            rows.append((eid, short))
    df = pd.DataFrame(rows, columns=["entity_id", "alias"])
    df = df.drop_duplicates(["entity_id", "alias"]).reset_index(drop=True)
    df["embedding"] = [embed_string(a, dim).tolist() for a in df["alias"]]
    df["entity_id"] = df["entity_id"].astype("int64")
    return df


def _junk_block(i: int, variant: int) -> str:
    """Deterministic boilerplate filler: the markup a real crawl page drags
    along (analytics scripts, css, nav trees, promo asides) that the
    extractor must strip. ~1 KB per block."""
    kind = (variant + i) % 4
    if kind == 0:
        body = ";".join(f"var v{j}={(variant * 31 + i * 7 + j) % 9973}" for j in range(40))
        return f'<script type="text/javascript">{body};trackPage("{variant}-{i}")</script>'
    if kind == 1:
        rules = " ".join(
            f".c{j}-{i}{{margin:{j % 13}px;padding:{(j * 3) % 17}px;color:#{(variant + j) % 10}{(i + j) % 10}{j % 10}}}"
            for j in range(30)
        )
        return f"<style>{rules}</style>"
    if kind == 2:
        items = "".join(
            f'<li><a href="/cat/{(variant + j) % 50}/{i}">Category {(variant + j) % 50} item {j}</a></li>'
            for j in range(25)
        )
        return f"<nav><ul>{items}</ul></nav>"
    items = "".join(
        f'<div class="promo"><span>Sponsored {j}</span><a href="/ad/{i}/{j}">Offer {(variant * j + i) % 997}</a></div>'
        for j in range(20)
    )
    return f"<aside>{items}</aside>"


def _page_html(
    title: str, site: str, paragraphs: list[str], variant: int, junk_blocks: int = 0
) -> bytes:
    """Wrap ground-truth paragraphs in boilerplate html.

    extract_text() inverts this exactly: head/nav/header/footer/aside and
    comments vanish, <p> boundaries become newlines, entities round-trip
    through escape/unescape. ``junk_blocks`` controls how much realistic
    boilerplate surrounds the article (Common-Crawl pages are mostly
    boilerplate by bytes — extraction cost must reflect that).
    """
    esc = [_htmlmod.escape(p, quote=False) for p in paragraphs]
    body_ps = "\n".join(f"<p>{e}</p>" for e in esc)
    aside = "<aside>Related: sponsored links</aside>" if variant % 3 == 0 else ""
    comment = "<!-- rendered by cms v2 -->" if variant % 2 == 0 else ""
    pre_junk = "\n".join(_junk_block(i, variant) for i in range(junk_blocks // 2))
    post_junk = "\n".join(
        _junk_block(i, variant) for i in range(junk_blocks // 2, junk_blocks)
    )
    html = (
        f"<html><head><title>{_htmlmod.escape(title, quote=False)}</title>"
        f"<style>body{{font-family:serif;margin:0}}</style>"
        f"<script>var t={variant};</script></head>\n"
        f"<body>{comment}\n"
        f"<nav><ul><li>Home</li><li>News</li><li>About</li></ul></nav>\n"
        f"{pre_junk}\n"
        f"<header><h1>{site}</h1></header>\n"
        f"<article>\n{body_ps}\n</article>\n"
        f"{post_junk}\n"
        f"{aside}\n"
        f"<footer>&copy; 2024 {site} &mdash; all rights reserved</footer>\n"
        f"</body></html>"
    )
    return html.encode("utf-8")


def gen_page_row(
    k: int,
    by_entity: dict[int, list[str]],
    eids: np.ndarray,
    seed: int = SEED,
    min_sent: int = 3,
    max_sent: int = 11,
    junk_blocks: int = 0,
) -> tuple[tuple, list[tuple]]:
    """Generate page k. Per-page rng seeded by (seed, k), so generation is
    embarrassingly parallel and identical whether run in a pandas loop (the
    oracle/tests) or distributed via ``pages_spark`` (the bench corpus)."""
    rng = np.random.default_rng([seed, k])
    site_id = int(rng.integers(200))
    site = f"site{site_id}.example"
    url = f"https://{site}/p/{k:08d}"
    warc_ts = datetime(2024, 1, 1) + timedelta(seconds=site_id * 100000 + k * 7)
    lang = _LANGS[int(rng.integers(len(_LANGS)))]

    # --- quarantine fixtures (FIXTURES.md §4) ---
    if k % 211 == 5:  # empty body after strip
        return (url, warc_ts, _page_html("empty", site, [], k, junk_blocks), None, lang), []
    if k % 211 == 6:  # undecodable bytes
        html = b"\xff\xfe\x00broken" + b"<html><body><p>x</p></body></html>"
        return (url, warc_ts, html, None, lang), []

    truth_rows: list[tuple] = []
    n_sent = int(rng.integers(min_sent, max_sent))
    paragraphs: list[str] = []
    cur: list[str] = []
    sent_idx = 0
    for _ in range(n_sent):
        roll = rng.random()
        if roll < 0.30:
            sent = _FILLER[int(rng.integers(len(_FILLER)))]
            if k % 499 == 7 and len(cur) == 0:
                # NUL-byte edge case inside a filler sentence
                sent = "Edge\x00case token appears here."
            cur.append(sent)
        else:
            # triple sentence from the closed grammar
            if rng.random() < HUB_SHARE:
                subj_e = HUB_ENTITY
            else:
                subj_e = int(eids[rng.integers(len(eids))])
            obj_e = int(eids[rng.integers(len(eids))])
            pred = PRED_LIST[int(rng.integers(len(PRED_LIST)))]
            subj_alias = by_entity[subj_e][int(rng.integers(len(by_entity[subj_e])))]
            obj_alias = by_entity[obj_e][int(rng.integers(len(by_entity[obj_e])))]
            subj_s, obj_s = subj_alias, obj_alias
            if rng.random() < NOISE_SHARE:
                subj_s = subj_alias.lower()
            if rng.random() < NOISE_SHARE:
                obj_s = obj_alias.upper()
            sent = f"{subj_s} {_PHRASE_BY_PRED[pred]} {obj_s}."
            cur.append(sent)
            truth_rows.append((url, sent_idx, subj_s, pred, obj_s, subj_e, obj_e))
        sent_idx += 1
        if len(cur) >= 3 or rng.random() < 0.4:
            paragraphs.append(" ".join(cur))
            cur = []
    if cur:
        paragraphs.append(" ".join(cur))
    text = "\n".join(paragraphs)
    html = _page_html(f"{site} article {k}", site, paragraphs, k, junk_blocks)
    return (url, warc_ts, html, text, lang), truth_rows


def _entity_lookup(aliases: pd.DataFrame) -> tuple[dict[int, list[str]], np.ndarray]:
    by_entity: dict[int, list[str]] = {}
    for eid, alias in zip(aliases["entity_id"], aliases["alias"]):
        by_entity.setdefault(int(eid), []).append(alias)
    return by_entity, np.array(sorted(by_entity), dtype=np.int64)


def gen_pages(
    n_pages: int,
    seed: int = SEED,
    n_entities: int | None = None,
    dim: int = EMBED_DIM,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Generate (pages, truth, aliases) in-process (test scale).

    pages:   url, warc_ts, html(bytes), text, lang   — input_hint shape
    truth:   url, sent_idx, subj, pred, obj, subj_entity, obj_entity
             (generator-intended link targets, pre-canonicalization)
    aliases: entity_id, alias, embedding
    """
    if n_entities is None:
        n_entities = n_entities_for(n_pages)
    aliases = gen_aliases(n_entities, seed=seed, dim=dim)
    by_entity, eids = _entity_lookup(aliases)
    page_rows = []
    truth_rows: list[tuple] = []
    for k in range(n_pages):
        row, truths = gen_page_row(k, by_entity, eids, seed=seed)
        page_rows.append(row)
        truth_rows.extend(truths)
    pages = pd.DataFrame(
        page_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    truth = pd.DataFrame(
        truth_rows,
        columns=["url", "sent_idx", "subj", "pred", "obj", "subj_entity", "obj_entity"],
    )
    return pages, truth, aliases


def pages_spark(
    spark,
    n_pages: int,
    seed: int = SEED,
    n_entities: int | None = None,
    min_sent: int = 3,
    max_sent: int = 11,
    junk_blocks: int = 0,
):
    """Distributed page generation: spark.range -> Arrow batches of pages.

    Same per-page rng as ``gen_pages`` (bit-identical corpus), but generated
    executor-side in parallel — this is how the bench corpus scales without
    a driver-side bottleneck. Returns (pages_df, aliases_pdf); ground-truth
    columns are dropped (the distributed corpus is input-only).
    """
    from pyspark.sql import functions as F  # local import: module stays pandas-importable

    if n_entities is None:
        n_entities = n_entities_for(n_pages)
    alias_full = gen_aliases(n_entities, seed=seed)
    by_entity, eids = _entity_lookup(alias_full)
    bc = spark.sparkContext.broadcast((by_entity, eids))

    def _gen(batches):
        be, ei = bc.value
        for pdf in batches:
            rows = [
                gen_page_row(
                    int(k), be, ei, seed=seed, min_sent=min_sent,
                    max_sent=max_sent, junk_blocks=junk_blocks,
                )[0]
                for k in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    # ~2k pages per generation partition: output frames stay ~80 MB even
    # for boilerplate-heavy pages, and stragglers stay short
    n_parts = max(spark.sparkContext.defaultParallelism * 2, n_pages // 2000, 8)
    df = (
        spark.range(0, n_pages)
        .repartition(n_parts)
        .mapInPandas(
            _gen,
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
        .select("url", "warc_ts", "html", "lang")
    )
    return df, alias_full


def write_fixture(out_dir: str, n_pages: int, seed: int = SEED) -> None:
    """Materialize pages/truth/aliases parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages, truth, aliases = gen_pages(n_pages, seed=seed)
    pages.to_parquet(os.path.join(out_dir, "pages.parquet"), index=False)
    truth.to_parquet(os.path.join(out_dir, "truth.parquet"), index=False)
    aliases.to_parquet(os.path.join(out_dir, "aliases.parquet"), index=False)
