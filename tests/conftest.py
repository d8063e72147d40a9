import pytest

from firebase_realtime_database_backup_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark(
        app_name="frdb-spark-tests",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
