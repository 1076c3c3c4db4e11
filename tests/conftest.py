import os

import pytest

from streaming_demos_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Gitignored scratch area used by tests that need writable checkpoints /
# model-store dirs; recreated here because the driver wipes it between rounds.
os.makedirs("/root/repo/.scratch", exist_ok=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
