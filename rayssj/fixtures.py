"""Deterministic entity-labeled web-page fixture (FIXTURES.md F1).

Synthesizes a Common-Crawl-shaped table (url, warc_ts, html, text, lang,
entity_id) with controlled duplicate structure for the pairwise-F1 ≥ 0.99
cluster-quality gate (BASELINE.md row 1). Pure function of the seed — no
external data, reproducible across runs/machines.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

_VOCAB = [f"w{i:03d}" for i in range(500)]
_BOILER = "subscribe newsletter cookie policy terms privacy contact about"
_LANGS = ["en", "en", "en", "es", "de", "fr", "zh"]


def make_pages(n_entities: int = 300, seed: int = 42,
               hot_boiler_frac: float = 0.05,
               with_edge_cases: bool = True) -> pd.DataFrame:
    """~1-6 page variants per entity via seeded edit ops (token drop/swap,
    char typo, boilerplate prefix/suffix); includes exact dupes, near-dupes,
    singletons, a hot boilerplate string, empty/null/unicode rows."""
    rng = random.Random(seed)
    rows = []
    rid = 0
    for ent in range(n_entities):
        base = rng.sample(_VOCAB, rng.randint(24, 36))
        n_var = rng.randint(1, 6)
        for v in range(n_var):
            toks = list(base)
            if v > 0:
                n_edits = rng.randint(0, 2)
                for _ in range(n_edits):
                    op = rng.random()
                    if op < 0.4 and len(toks) > 5:
                        toks.pop(rng.randrange(len(toks)))
                    elif op < 0.8:
                        i = rng.randrange(len(toks))
                        toks[i] = rng.choice(_VOCAB)
                    else:
                        i, j = rng.randrange(len(toks)), rng.randrange(len(toks))
                        toks[i], toks[j] = toks[j], toks[i]
            text = " ".join(toks)
            if rng.random() < hot_boiler_frac:
                text = _BOILER + " " + text
            rows.append({"rid": rid, "entity_id": ent, "text": text})
            rid += 1
    if with_edge_cases:
        ent = n_entities
        for special in ["", None, "naïve café 北京", "x"]:
            rows.append({"rid": rid, "entity_id": ent, "text": special})
            rid += 1
            ent += 1

    rng2 = np.random.default_rng(seed)
    out = []
    for r in rows:
        text = r["text"]
        html = (None if text is None else
                ("<html><head><title>p" + str(r["rid"]) + "</title></head><body><p>"
                 + text + "</p></body></html>").encode())
        out.append({
            "url": f"https://site{r['rid'] % 37}.example/{r['rid']:06d}",
            "warc_ts": np.datetime64("2024-01-01T00:00:00", "us")
            + np.timedelta64(r["rid"] * 137, "s"),
            "html": html,
            # hold out 20%: pipeline must re-derive text from html
            "text": (None if (r["rid"] % 5 == 0 and text is not None)
                     else ("p" + str(r["rid"]) + "\n" + text if text is not None else None)),
            "lang": _LANGS[r["rid"] % len(_LANGS)],
            "entity_id": r["entity_id"],
        })
    return pd.DataFrame(out)


def pairwise_f1(pred_components: dict, truth_labels: dict) -> tuple[float, float, float]:
    """Pairwise precision/recall/F1 of predicted components vs entity labels
    over all node pairs (nodes = keys of truth_labels present in pred)."""
    from collections import defaultdict

    def pair_set(assign: dict) -> set:
        groups = defaultdict(list)
        for node, c in assign.items():
            groups[c].append(node)
        pairs = set()
        for members in groups.values():
            members = sorted(members)
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    pairs.add((members[i], members[j]))
        return pairs

    nodes = set(truth_labels)
    pred = {n: pred_components.get(n, f"__single_{n}") for n in nodes}
    truth_pairs = pair_set({n: truth_labels[n] for n in nodes})
    pred_pairs = pair_set(pred)
    tp = len(truth_pairs & pred_pairs)
    prec = tp / len(pred_pairs) if pred_pairs else 1.0
    rec = tp / len(truth_pairs) if truth_pairs else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return prec, rec, f1
