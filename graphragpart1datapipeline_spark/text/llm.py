"""LLM generation stage T9/T10 (reference: Qwen2.5 via MLX generating
per-community summaries, utils/llm_helpers.py:45-112 +
generate_community_summaries.py:52-83).

Engine split, mirroring the reference exactly:
- the PROMPT is deterministic data → built as column expressions
  (:func:`build_summary_prompt`), so it is testable and oracle-able;
- the GENERATION is model-coupled → an injected ``list[str] ->
  list[str]`` callable behind an Arrow-batched ``mapInPandas`` stage
  (:func:`generate_with`). A real deployment loads the model once per
  executor inside the callable's closure (the same seam as the
  embedding encoder); tests inject :func:`echo_summarizer`.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_summary_prompt(
    name: Column,
    member_count: Column,
    top_genres: Column,
    top_countries: Column,
    representatives: Column,
) -> Column:
    """Deterministic community-summary prompt from rollup aggregates
    (reference prompt template, generate_community_summaries.py:52-83)."""
    return F.concat(
        F.lit("Summarize the music community '"),
        name,
        F.lit("' with "),
        member_count.cast("string"),
        F.lit(" members. Top genres: "),
        F.array_join(F.coalesce(top_genres, F.array()), ", "),
        F.lit(". Countries: "),
        F.array_join(F.coalesce(top_countries, F.array()), ", "),
        F.lit(". Representative artists: "),
        F.array_join(F.coalesce(representatives, F.array()), ", "),
        F.lit("."),
    )


def echo_summarizer(prompts: list[str]) -> list[str]:
    """Deterministic generation stub: first 12 whitespace tokens of the
    prompt. Stands in for the model so plumbing tests have stable
    goldens (the container ships no LLM)."""
    return [" ".join(p.split()[:12]) for p in prompts]


def extractive_generator(
    m: int = 3, iters: int = 3, stopwords: frozenset[str] | None = None
) -> Callable[[list[str]], list[str]]:
    """The engine's DEFAULT generator for :func:`generate_with` — a
    deterministic per-prompt TextRank extractive summary (the
    executor-local mirror of text/summarize.py's distributed operator:
    sentence split on ``[.!?]+``, stopword-filtered token-set overlap
    weights, exact-integer PageRank with damping 17/20, top-``m``
    sentences re-emitted in document order joined by '. '). Pure
    Python per string — no model, no network, bit-reproducible — so
    the T9 surface WORKS in this container; swap in a model-backed
    callable for real abstractive generation."""
    from .analysis import STOPWORDS

    sw = frozenset(STOPWORDS["en"] if stopwords is None else stopwords)
    scale = 10**12

    def summarize_one(text: str) -> str:
        import re

        sents = [
            (i + 1, s.strip())
            for i, s in enumerate(re.split(r"[.!?]+", text))
            if s.strip()
        ]
        if not sents:
            return ""
        toks = {
            pos: {t for t in s.lower().split() if t and t not in sw}
            for pos, s in sents
        }
        w: dict[tuple[int, int], int] = {}
        keys = sorted(toks)
        for i, a in enumerate(keys):
            for b in keys[i + 1:]:
                ov = len(toks[a] & toks[b])
                if ov >= 1:
                    w[(a, b)] = ov
        nodes = sorted({n for ab in w for n in ab})
        rank = dict.fromkeys(nodes, scale // len(nodes)) if nodes else {}
        deg = dict.fromkeys(nodes, 0)
        for (a, b), ov in w.items():
            deg[a] += ov
            deg[b] += ov
        for _ in range(iters if nodes else 0):
            contrib = dict.fromkeys(nodes, 0)
            for (a, b), ov in w.items():
                contrib[b] += rank[a] * ov // deg[a]
                contrib[a] += rank[b] * ov // deg[b]
            rank = {
                n: scale * 3 // (20 * len(nodes)) + 17 * contrib[n] // 20
                for n in nodes
            }
        scored = sorted(
            sents, key=lambda ps: (-rank.get(ps[0], 0), ps[0])
        )[:m]
        return ". ".join(s for _, s in sorted(scored))

    def gen(prompts: list[str]) -> list[str]:
        return [summarize_one(p) for p in prompts]

    return gen


def generate_with(
    df: DataFrame,
    prompt_col: str,
    generator: Callable[[list[str]], list[str]] | None = None,
    out_col: str = "summary",
    batch_size: int = 16,
) -> DataFrame:
    """Run ``generator`` over every prompt, appending ``out_col``.

    STUB SEAM: with ``generator=None`` this raises NotImplementedError —
    there is no LLM in this environment; inject a model-backed callable
    (loaded per executor, batched ``batch_size`` prompts at a time,
    mirroring the reference's 45-70 s/summary single-host loop with a
    distributed one), or the engine's deterministic
    :func:`extractive_generator` (TextRank top-m sentences — works in
    this container, bit-reproducible)."""
    if generator is None:
        raise NotImplementedError(
            "no LLM available in this environment; inject a generator "
            "(a served-model client, or the deterministic "
            "extractive_generator(m=...) this module ships)"
        )
    fields = df.schema.fieldNames()
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prompts = pdf[prompt_col].fillna("").tolist()
            outs: list[str] = []
            for i in range(0, len(prompts), batch_size):
                outs.extend(generator(prompts[i : i + batch_size]))
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.select(*fields).mapInPandas(gen, schema=out_schema)
