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
    distributed one)."""
    if generator is None:
        raise NotImplementedError(
            "no LLM available in this environment; inject a generator "
            "(e.g. a served-model client) or use echo_summarizer in tests"
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
