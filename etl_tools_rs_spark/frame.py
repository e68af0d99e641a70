"""EngineFrame — the fluent facade over the whole operator surface.

The reference composes pipelines by wrapping boxed trait objects
(``CsvDecoder::new(opts, Box::new(LocalFs{...}))`` …,
SURVEY §1.3); the engine's equivalent composition surface is a thin
wrapper over DataFrame that exposes every engine operator as a chainable
method. It adds NOTHING to the execution model — each method forwards to
the module-level operator (one import point, one docstring, one plan) —
it exists so a reference user can write the same shape of pipeline:

    out = (EngineFrame.read(spark, path, format="json")
           .transform(cols={...}, where=...)
           .left_join(dim.df, pred)
           .dedup_exact(["text"])
           .df)

``.df`` unwraps to the plain DataFrame at any point; ``wrap`` re-enters.
Everything stays lazy; Catalyst sees exactly the same logical plan as
direct operator calls (tested).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession


class EngineFrame:
    """Chainable facade; hold one, call operators, unwrap with ``.df``."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- construction --------------------------------------------------------
    @classmethod
    def wrap(cls, df: DataFrame) -> "EngineFrame":
        return cls(df)

    @classmethod
    def read(cls, spark: SparkSession, path: str, format: str = "parquet", **options: Any) -> "EngineFrame":
        from etl_tools_rs_spark.sources.files import FileSource

        return cls(FileSource(paths=[path], format=format, **options).to_df(spark))

    # -- generic passthrough -------------------------------------------------
    def pipe(self, fn: Callable[[DataFrame], DataFrame]) -> "EngineFrame":
        """Apply any DataFrame→DataFrame function and stay in the chain."""
        return EngineFrame(fn(self.df))

    def __getattr__(self, name: str):
        # anything not wrapped explicitly falls through to the DataFrame;
        # DataFrame-returning methods re-wrap so the chain continues
        attr = getattr(self.df, name)
        if callable(attr):
            def call(*a, **kw):
                out = attr(*a, **kw)
                return EngineFrame(out) if isinstance(out, DataFrame) else out

            return call
        return attr

    # -- transforms (T1/T2/T4) ----------------------------------------------
    def transform(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.transform import transform

        return EngineFrame(transform(self.df, *a, **kw))

    def flat_transform(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.transform import flat_transform

        return EngineFrame(flat_transform(self.df, *a, **kw))

    def batch_by_count(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.batch import batch_by_count

        return EngineFrame(batch_by_count(self.df, *a, **kw))

    # -- joins (J1 + extensions) --------------------------------------------
    def left_join(self, right: DataFrame, predicate: Column, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.join import left_join

        return EngineFrame(left_join(self.df, right, predicate, **kw))

    def join_(self, right: DataFrame, on, how: str = "inner", **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.join import join

        return EngineFrame(join(self.df, right, on, how, **kw))

    def asof_join(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.join import asof_join

        return EngineFrame(asof_join(self.df, right, *a, **kw))

    def range_join(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.join import range_join

        return EngineFrame(range_join(self.df, right, *a, **kw))

    def fuzzy_join(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.fuzzy import fuzzy_join

        return EngineFrame(fuzzy_join(self.df, right, *a, **kw))

    # -- dedup / sampling ----------------------------------------------------
    def dedup_exact(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import dedup_exact

        return EngineFrame(dedup_exact(self.df, *a, **kw))

    def dedup_fuzzy(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.fuzzy import dedup_fuzzy

        return EngineFrame(dedup_fuzzy(self.df, *a, **kw))

    def hash_sample(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sample import hash_sample

        return EngineFrame(hash_sample(self.df, *a, **kw))

    # -- quality / profiling -------------------------------------------------
    def validate(self, rules) -> "EngineFrame":
        from etl_tools_rs_spark.operators.validate import validate

        return EngineFrame(validate(self.df, rules))

    def profile(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import profile

        return EngineFrame(profile(self.df, *a, **kw))

    def conform_schema(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.schema import conform_schema

        out, _report = conform_schema(self.df, *a, **kw)
        return EngineFrame(out)

    def corr_matrix(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import corr_matrix

        return EngineFrame(corr_matrix(self.df, *a, **kw))

    def cat_association(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import cat_association

        return EngineFrame(cat_association(self.df, *a, **kw))

    def rater_agreement(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import rater_agreement

        return EngineFrame(rater_agreement(self.df, *a, **kw))

    def scd2_history(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.merge import scd2_history

        return EngineFrame(scd2_history(self.df, *a, **kw))

    def rolling_zscore(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import rolling_zscore

        return EngineFrame(rolling_zscore(self.df, *a, **kw))

    def pagerank(self, *a, **kw) -> "EngineFrame":
        """Treat this frame as an edge list (src/dst columns)."""
        from etl_tools_rs_spark.operators.graph import pagerank

        return EngineFrame(pagerank(self.df, *a, **kw))

    # -- sinks ---------------------------------------------------------------
    def write_to(self, path: str, format: str = "parquet", **kw) -> None:
        from etl_tools_rs_spark.sinks.files import FileSink

        FileSink(path, format=format, **kw).write(self.df)

    def write_training_shards(self, path: str, n_shards: int, **kw):
        from etl_tools_rs_spark.sinks.shards import write_training_shards

        return write_training_shards(self.df, path, n_shards, **kw)

    def quantize_int8(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.similarity import quantize_int8

        return EngineFrame(quantize_int8(self.df, *a, **kw))

    def prefix_jaccard_pairs(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import prefix_jaccard_pairs

        return EngineFrame(prefix_jaccard_pairs(self.df, *a, **kw))

    def robust_scale(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.features import robust_scale

        return EngineFrame(robust_scale(self.df, *a, **kw))

    def winsorize(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.features import winsorize

        return EngineFrame(winsorize(self.df, *a, **kw))

    def time_weighted_avg(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import time_weighted_avg

        return EngineFrame(time_weighted_avg(self.df, *a, **kw))

    def linreg(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import linreg

        return EngineFrame(linreg(self.df, *a, **kw))

    def path_ngrams(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import path_ngrams

        return EngineFrame(path_ngrams(self.df, *a, **kw))

    def transition_matrix(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import transition_matrix

        return EngineFrame(transition_matrix(self.df, *a, **kw))

    # -- round-3 late additions ---------------------------------------------
    def duplicate_spans(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import duplicate_spans

        return EngineFrame(duplicate_spans(self.df, *a, **kw))

    def remove_duplicate_spans(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import remove_duplicate_spans

        return EngineFrame(remove_duplicate_spans(self.df, *a, **kw))

    def semdedup(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.similarity import semdedup

        return EngineFrame(semdedup(self.df, *a, **kw))

    def jl_project(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.similarity import jl_project

        return EngineFrame(jl_project(self.df, *a, **kw))

    def leakage_safe_split(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sample import leakage_safe_split

        return EngineFrame(leakage_safe_split(self.df, *a, **kw))

    def triangle_count(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.graph import triangle_count

        return EngineFrame(triangle_count(self.df, *a, **kw))

    def bpe_tokenize(self, merges, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.bpe import bpe_tokenize

        return EngineFrame(bpe_tokenize(self.df, merges, *a, **kw))

    def cap_per_group(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sample import cap_per_group

        return EngineFrame(cap_per_group(self.df, *a, **kw))

    def quantile_sketch(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sketch import quantile_sketch

        return EngineFrame(quantile_sketch(self.df, *a, **kw))

    def heavy_hitters(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sketch import heavy_hitters

        return EngineFrame(heavy_hitters(self.df, *a, **kw))

    def minhash_cross_pairs(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import minhash_cross_pairs

        return EngineFrame(minhash_cross_pairs(self.df, right, *a, **kw))

    def decontaminate_near_dup(self, benchmark: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import decontaminate_near_dup

        return EngineFrame(decontaminate_near_dup(self.df, benchmark, *a, **kw))

    def rank_normalize(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.features import rank_normalize

        return EngineFrame(rank_normalize(self.df, *a, **kw))

    def concentration_profile(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import concentration_profile

        return EngineFrame(concentration_profile(self.df, *a, **kw))

    def budget_allocate(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.sample import budget_allocate

        return EngineFrame(budget_allocate(self.df, *a, **kw))

    def prefix_jaccard_cross_pairs(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import prefix_jaccard_cross_pairs

        return EngineFrame(prefix_jaccard_cross_pairs(self.df, right, *a, **kw))

    def bpe_tokenize_pandas(self, merges, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.bpe import bpe_tokenize_pandas

        return EngineFrame(bpe_tokenize_pandas(self.df, merges, *a, **kw))

    def attribute_last_touch(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import attribute_last_touch

        return EngineFrame(attribute_last_touch(self.df, *a, **kw))

    def ngram_novelty(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.text import ngram_novelty

        return EngineFrame(ngram_novelty(self.df, *a, **kw))

    def zipf_slope(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.text import zipf_slope

        return EngineFrame(zipf_slope(self.df, *a, **kw))

    def funnel(self, steps, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.events import funnel

        return EngineFrame(funnel(self.df, steps, *a, **kw))

    def knn_lsh_from(self, queries: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.similarity import knn_lsh

        return EngineFrame(knn_lsh(self.df, queries, *a, **kw))

    def c4_line_filter(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.text import c4_line_filter

        return EngineFrame(c4_line_filter(self.df, *a, **kw))

    def bigram_score(self, model, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.lm import bigram_score

        return EngineFrame(bigram_score(self.df, model, *a, **kw))

    def rrf_fuse_with(self, others: list[DataFrame], *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.index import rrf_fuse

        return EngineFrame(rrf_fuse([self.df, *others], *a, **kw))

    def skew_report(self, keys, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.profile import skew_report

        return EngineFrame(skew_report(self.df, keys, *a, **kw))

    def overlap_join(self, right: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.join import overlap_join

        return EngineFrame(overlap_join(self.df, right, *a, **kw))

    def image_phash(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.multimodal import image_phash

        return EngineFrame(image_phash(self.df, *a, **kw))

    def mmr_rerank(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.similarity import mmr_rerank

        return EngineFrame(mmr_rerank(self.df, *a, **kw))

    def curation_flags(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.curation import curation_flags

        return EngineFrame(curation_flags(self.df, *a, **kw))

    def curation_funnel(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.curation import curation_funnel

        return EngineFrame(curation_funnel(self.df, *a, **kw))

    def audio_features(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.multimodal import audio_features

        return EngineFrame(audio_features(self.df, *a, **kw))

    def image_resize(self, width: int, height: int) -> "EngineFrame":
        from etl_tools_rs_spark.operators.multimodal import image_resize

        return EngineFrame(image_resize(self.df, width, height))

    def corpus_report(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.curation import corpus_report

        return EngineFrame(corpus_report(self.df, *a, **kw))

    def video_frame_sample(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.multimodal import video_frame_sample

        return EngineFrame(video_frame_sample(self.df, *a, **kw))

    # -- r5: data selection / entity resolution / index maintenance ---------
    def dsir_log_weights(self, target: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dsir import dsir_log_weights

        return EngineFrame(dsir_log_weights(self.df, target, *a, **kw))

    def dsir_sample(self, target: DataFrame, k: int, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dsir import dsir_sample

        return EngineFrame(dsir_sample(self.df, target, k, *a, **kw))

    def dsir_score(self, lr_micro: list, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dsir import dsir_score

        return EngineFrame(dsir_score(self.df, lr_micro, *a, **kw))

    def golden_records(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.resolve import golden_records

        return EngineFrame(golden_records(self.df, *a, **kw))

    def resolve_entities(self, other: DataFrame, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.resolve import resolve_entities

        return EngineFrame(resolve_entities(self.df, other, *a, **kw))

    def keep_best_per_group(
        self, groups: DataFrame, quality_col: str, *a, **kw
    ) -> "EngineFrame":
        from etl_tools_rs_spark.operators.dedup import keep_best_per_group

        return EngineFrame(
            keep_best_per_group(self.df, groups, quality_col, *a, **kw)
        )

    def minhash_band_index(self, *a, **kw) -> "EngineFrame":
        from etl_tools_rs_spark.operators.lsh_index import minhash_band_index

        return EngineFrame(minhash_band_index(self.df, *a, **kw))
