import pytest

from pboh_spark import synth
from pboh_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, app_name="pboh_tests", shuffle_partitions=16)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def universe():
    return synth.EntityUniverse()


@pytest.fixture(scope="session")
def tiny(spark, universe):
    """~100 conversations: transcripts + gold mentions."""
    t, g = synth.generate_transcripts(spark, 100, universe=universe)
    return t.cache(), g.cache()


@pytest.fixture(scope="session")
def anchors(spark, universe):
    return synth.generate_anchors(spark, 3000, universe=universe).cache()
