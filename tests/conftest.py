from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from webfilter.session import get_spark  # noqa: E402

N_DOCS = 1500


@pytest.fixture(scope="session")
def spark():
    s = get_spark("webfilter-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth_dir(spark, tmp_path_factory):
    """One deterministic synthetic dataset shared by the whole suite."""
    from webfilter import synth

    d = tmp_path_factory.mktemp("synth")
    synth.write_dataset(spark, N_DOCS, str(d))
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def pipeline_out(spark, synth_dir, tmp_path_factory):
    """One full pipeline run over the shared dataset."""
    from webfilter import pipeline

    out = tmp_path_factory.mktemp("out")
    res = pipeline.run_filter(
        spark, f"{synth_dir}/pages.parquet", str(out), n_buckets=16, run_id="testrun"
    )
    assert res["docs"] == N_DOCS
    yield str(out)
    shutil.rmtree(out, ignore_errors=True)
