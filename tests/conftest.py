"""Shared fixtures: one SparkSession per test run + the reference-shaped
file fixtures from FIXTURES.md (F1 malformed-json mix, F2 ndjson/csv)."""

from __future__ import annotations

import os

import pytest

# Python workers don't inherit pytest's sys.path tweaks — export the tests
# dir so classes defined in test modules (e.g. StreamHandler subclasses)
# unpickle on executors. Must happen before the JVM/session starts.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = (
    _TESTS_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


@pytest.fixture(scope="session")
def spark():
    from etl_tools_rs_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """F2 fixtures: 10-line ndjson with exactly one malformed line (expect
    9 ok / 1 err — reference decoder_fs.rs:71-72) and a 14-good-row CSV
    (expect 14 ok / 0 err — decoder_fs.rs:130-131)."""
    d = tmp_path_factory.mktemp("fixtures")
    lines = []
    for i in range(10):
        if i == 2:
            lines.append('{"index": "2", "words": not valid json}')
        else:
            lines.append(f'{{"index": "{i}", "words": "line number {i}"}}')
    (d / "10_lines.ndjson").write_text("\n".join(lines) + "\n")

    csv_rows = ["index,words"] + [f'"{i}","some, quoted words"' for i in range(14)]
    (d / "14_good_lines.csv").write_text("\n".join(csv_rows) + "\n")
    return d


# F1 mix (simple-pipeline.rs:148-174): 3 ok / 2 malformed JSON lines
F1_LINES = [
    '{"name": "Bob", "todo": ["mow lawn"], "id": "bob1"}',
    "1 this is a malformed json line",
    '{"name": null, "todo": [], "id": "anon1"}',
    "2 another malformed line",
    '{"name": "Angela", "todo": ["paint fence", "buy paint"], "id": "ang1"}',
]
