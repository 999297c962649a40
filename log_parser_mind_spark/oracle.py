"""Single-threaded pandas oracle for the full pipeline (SURVEY §5 step 2).

An INDEPENDENT re-implementation of the canonical pipeline semantics —
plain Python loops + pandas groupbys, no Spark, no shared clustering code —
used by the test suite for double-entry bookkeeping against the distributed
engine. Where the literal reference is order-sensitive, this oracle defines
the canonical order: rows sorted by (conv_id, turn_idx); distinct masked
signatures processed in first-occurrence order within each tree-leaf group.

Reference semantics implemented literally:
  masking     drain.go:172-206      similarity/generalize  drain.go:263-276,345-363
  variables   drain.go:366-381      sizes                  cmd/compression/main.go:67-91
  redaction   redactor.go:92-121    severity/z-score       cmd/anomaly/main.go:113-264
"""

from __future__ import annotations

import math
import re

import pandas as pd

from .config import WILDCARD, DrainConfig
from .operators.drain_core import (
    extract_variables,
    fnv64a,
    is_variable,
    preprocess_tokens,
    tokenize,
)

_PII = [
    ("email", re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"), "[EMAIL_REDACTED]"),
    ("phone", re.compile(r"\b(?:\+?1[-.\s]?)?\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}\b"), "[PHONE_REDACTED]"),
    ("ssn", re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "[SSN_REDACTED]"),
    ("credit_card", re.compile(r"\b(?:\d{4}[-\s]?){3}\d{4}\b"), "[CC_REDACTED]"),
]


def redact(text: str) -> str:
    for _, pattern, placeholder in _PII:
        text = pattern.sub(placeholder, text)
    return text


def _leaf_key(masked: list[str], max_depth: int = 4) -> tuple:
    keys = [len(masked)]
    for i in range(max_depth - 2):
        keys.append(masked[i] if len(masked) > i + 1 else None)
    return tuple(keys)


def run_pipeline(transcripts: pd.DataFrame, config: DrainConfig | None = None) -> dict:
    """transcripts: columns conv_id, turn_idx, role, text, tool, ts.
    Returns dict with parsed (DataFrame), templates (DataFrame)."""
    config = config or DrainConfig()
    df = transcripts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    # --- mask ---------------------------------------------------------------
    rows = []
    for r in df.itertuples():
        tokens = tokenize(r.text) if isinstance(r.text, str) else []
        masked = preprocess_tokens(tokens)
        rows.append((r.conv_id, r.turn_idx, r.role, r.text, r.tool, r.ts,
                     tokens, masked, " ".join(masked), _leaf_key(masked, config.max_depth)))
    m = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts",
                                    "tokens", "masked", "sig", "leaf"])

    # --- cluster distinct sigs per leaf, first-occurrence order --------------
    sig_to_template: dict[str, tuple[str, str]] = {}
    creator_rows: set[tuple] = set()
    nonempty = m[m["masked"].map(len) > 0]
    firsts = nonempty.drop_duplicates("sig", keep="first")
    for _, group in firsts.groupby("leaf", sort=False):
        clusters: list[dict] = []
        for r in group.itertuples():  # group preserves (conv_id, turn_idx) sort order
            best, best_sim = None, 0.0
            for c in clusters:
                t = c["tokens"]
                if len(t) != len(r.masked):
                    continue
                sim = sum(1 for a, b in zip(t, r.masked) if a == b or a == WILDCARD) / len(t)
                if sim > best_sim and sim >= config.sim_threshold:
                    best_sim, best = sim, c
            if best is None:
                clusters.append({"tokens": list(r.masked), "sigs": [r.sig],
                                 "anchors": {(r.conv_id, r.turn_idx)}})
            else:
                best["tokens"] = [
                    a if i < len(r.masked) and a == r.masked[i] else (a if i >= len(r.masked) else WILDCARD)
                    for i, a in enumerate(best["tokens"])
                ]
                best["sigs"].append(r.sig)
        merged: dict[str, dict] = {}
        for c in clusters:
            template = " ".join(c["tokens"])
            slot = merged.setdefault(template, {"sigs": [], "anchors": set()})
            slot["sigs"].extend(c["sigs"])
            slot["anchors"] |= c["anchors"]
        for template, slot in merged.items():
            tid = f"tmpl_{fnv64a(template):x}"
            for s in slot["sigs"]:
                sig_to_template[s] = (tid, template)
            creator_rows |= slot["anchors"]

    # --- finalize parsed rows ------------------------------------------------
    out = []
    for r in m.itertuples():
        if len(r.masked) == 0:
            out.append((r.conv_id, r.turn_idx, r.ts, r.role, r.tool, r.text,
                        None, None, None, None,
                        len(r.text.encode()) if isinstance(r.text, str) else None, None))
            continue
        tid, template = sig_to_template[r.sig]
        variables = {k: redact(v) for k, v in extract_variables(template, r.text).items()}
        original = len(r.text.encode("utf-8"))
        compressed = len(tid) + sum(len(k.encode()) + len(v.encode()) for k, v in variables.items())
        out.append((r.conv_id, r.turn_idx, r.ts, r.role, r.tool, r.text, tid, template,
                    variables, (r.conv_id, r.turn_idx) in creator_rows, original, compressed))
    parsed = pd.DataFrame(out, columns=["conv_id", "turn_idx", "ts", "source", "tool", "text",
                                        "template_id", "template", "variables", "is_new",
                                        "original_size", "compressed_size"])

    # --- templates dimension --------------------------------------------------
    t = parsed.dropna(subset=["template_id"])
    templates = (
        t.groupby(["template_id", "template"], as_index=False)
        .agg(log_count=("template_id", "size"), first_seen=("ts", "min"), last_seen=("ts", "max"))
    )
    return {"parsed": parsed, "templates": templates}


def severity_class(template: str | None) -> str:
    if template is None:
        return "info"
    if "ERROR" in template:
        return "error"
    if "WARN" in template:
        return "warn"
    return "info"


def hourly_rollup(parsed: pd.DataFrame) -> pd.DataFrame:
    g = parsed.assign(hour=parsed["ts"].dt.floor("h"))
    return g.groupby(["source", "template_id", "hour"], dropna=False, as_index=False).agg(
        log_count=("ts", "size"),
        total_original_size=("original_size", "sum"),
        total_compressed_size=("compressed_size", "sum"),
    )


def error_rates(parsed: pd.DataFrame) -> pd.DataFrame:
    g = parsed.assign(
        minute=parsed["ts"].dt.floor("min"),
        sev=parsed["template"].map(severity_class),
    )
    return g.groupby(["source", "minute"], as_index=False).agg(
        error_count=("sev", lambda s: int((s == "error").sum())),
        warn_count=("sev", lambda s: int((s == "warn").sum())),
        total_count=("sev", "size"),
    )


def zscore_alerts(series: pd.DataFrame, now: pd.Timestamp, threshold: float = 3.0,
                  min_points: int = 10, agg: str = "sum") -> pd.DataFrame:
    """series: key, ts, value — mirrors anomaly._detect."""
    out = []
    for key, g in series.groupby("key"):
        if len(g) < min_points:
            continue
        mean = g["value"].mean()
        std = math.sqrt(((g["value"] - mean) ** 2).mean()) or 1.0
        recent = g[g["ts"] > now - pd.Timedelta(minutes=5)]["value"]
        if agg == "sum":
            if recent.empty:
                continue  # zero recent errors → z < 0, never alerts
            val = recent.sum()
            z = (val - mean) / std
        else:
            # Volume path: a fully silent key is the canonical drop case —
            # recent value 0, z = |0 − μ|/σ (cmd/anomaly/main.go:164-222).
            val = 0.0 if recent.empty else recent.mean()
            z = abs(val - mean) / std
        if z > threshold:
            out.append((key, float(val), float(z)))
    return pd.DataFrame(out, columns=["key", "value", "zscore"])


# ---------------------------------------------------------------------------
# BPE mirror (functions/bpe.py) — independent derivation for the golden:
# pandas histogram + NAIVE recount-per-iteration merge loop (no incremental
# bookkeeping — a different algorithm arriving at the same spec), and a
# from-scratch encoder. re.ASCII pins \s/\w to the same ASCII classes Java's
# regex uses, so both engines pre-tokenize identically on any input.
# ---------------------------------------------------------------------------

_BPE_WORD_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]", re.ASCII)


def bpe_histogram(texts: pd.Series, lowercase: bool = True) -> dict[str, int]:
    hist: dict[str, int] = {}
    for t in texts:
        t = "" if t is None or (isinstance(t, float) and math.isnan(t)) else str(t)
        if lowercase:
            t = t.lower()
        for w in _BPE_WORD_RE.findall(t):
            hist[w] = hist.get(w, 0) + 1
    return hist


def bpe_train(hist: dict[str, int], num_merges: int,
              max_word_types: int = 1_000_000) -> list[tuple[str, str]]:
    """Naive reference trainer: every iteration recounts ALL pairs over the
    whole word table, then merges the (max count, lexicographically
    smallest) pair. Cap order matches the engine: count DESC, word ASC."""
    capped = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[:max_word_types]
    words = {i: (tuple(w), f) for i, (w, f) in enumerate(capped)}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for i, (syms, f) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (tuple(out), f)
    return merges


def bpe_encode(text, merges: list[tuple[str, str]], lowercase: bool = True) -> list[str]:
    """Reference encoder: repeatedly merge all occurrences of the present
    pair with the lowest merge rank (GPT-2 greedy)."""
    ranks = {p: i for i, p in enumerate(merges)}
    t = "" if text is None or (isinstance(text, float) and math.isnan(text)) else str(text)
    if lowercase:
        t = t.lower()
    out: list[str] = []
    for w in _BPE_WORD_RE.findall(t):
        syms = list(w)
        while len(syms) > 1:
            ranked = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
            if not ranked:
                break
            _, best = min(ranked)
            nxt, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    nxt.append(best[0] + best[1])
                    j += 2
                else:
                    nxt.append(syms[j])
                    j += 1
            syms = nxt
        out.extend(syms)
    return out
