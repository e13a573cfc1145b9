from __future__ import annotations

import pytest

from jobinsight_data_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        app_name="jobinsight-tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield s
    # keep the session for the whole pytest run; stopping it between test
    # modules costs ~10s each on local mode.
