"""Shared fixtures: one Ray session per pytest run, small built indexes."""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus_dir(tmp_path_factory):
    from blacklab_ray.sources.synth import write_pages_corpus
    d = tmp_path_factory.mktemp("corpus") / "pages"
    write_pages_corpus(str(d), 200, n_shards=3)
    return str(d)


@pytest.fixture(scope="session")
def small_index(ray_session, small_corpus_dir, tmp_path_factory):
    from blacklab_ray.index import BuildParams, build_index
    idx = str(tmp_path_factory.mktemp("index") / "idx")
    build_index(small_corpus_dir, idx,
                BuildParams(num_buckets=8, n_salts=4, block_size=16,
                            max_seg_postings=500))
    return idx


@pytest.fixture(scope="session")
def small_oracle():
    """Pure-Python corpus model over the same 200 synthetic pages."""
    from blacklab_ray.testoracle import CorpusOracle
    from blacklab_ray.sources.synth import generate_pages
    return CorpusOracle.from_pages(generate_pages(200))


@pytest.fixture(scope="session")
def pangram_index(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    from blacklab_ray.index import BuildParams, build_index
    from blacklab_ray.sources.synth import pangram4_table
    root = tmp_path_factory.mktemp("pangram")
    src = root / "pages.parquet"
    pq.write_table(pangram4_table(), str(src))
    idx = str(root / "idx")
    build_index(str(src), idx, BuildParams(num_buckets=4, n_salts=2,
                                           block_size=4))
    return idx
