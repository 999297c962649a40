"""Unit tests ported from the reference's only test file
(internal/compression/drain/drain_test.go), run against the literal
single-threaded port. Expectations assert the ACTUAL behavior of drain.go as
written; where the reference's own test expectations contradict its code,
the discrepancy is documented inline.
"""

from log_parser_mind_spark.config import DrainConfig
from log_parser_mind_spark.operators.drain_core import (
    DrainTree,
    extract_variables,
    fnv64a,
    is_variable,
    preprocess_tokens,
    similarity,
    tokenize,
)


def test_parse_similar_error_logs_group_together():
    # drain_test.go:17-26
    tree = DrainTree(DrainConfig())
    logs = [
        "Error connecting to database at 192.168.1.1:5432",
        "Error connecting to database at 192.168.1.2:5432",
        "Error connecting to database at 10.0.0.1:5432",
    ]
    got = [tree.parse(l, 1).is_new for l in logs]
    assert got == [True, False, False]
    assert all(tree.parse(l, 1).template_id for l in logs)


def test_parse_different_patterns_create_different_clusters():
    # drain_test.go:28-36 expects [true, false, true]; the code as written
    # yields [true, TRUE, true]: "User jane ..." descends len_6 → "User" →
    # (no "jane" child, no wildcard child) and findBestMatch runs on the
    # "User" node's cluster list, which is empty because clusters are stored
    # one level deeper (drain.go:313-342). The reference test would fail
    # against its own implementation; we assert actual semantics.
    tree = DrainTree(DrainConfig())
    logs = [
        "User john logged in from 192.168.1.1",
        "User jane logged in from 192.168.1.2",
        "Server started on port 8080",
    ]
    got = [tree.parse(l, 1).is_new for l in logs]
    assert got == [True, True, True]


def test_extract_variables_on_second_match():
    # drain_test.go:62-82
    tree = DrainTree(DrainConfig())
    tree.parse("Error code 500 at 192.168.1.1", 1)
    result = tree.parse("Error code 404 at 10.0.0.1", 1)
    assert result.variables == {"var_0": "404", "var_1": "10.0.0.1"}
    assert result.template == "Error code <*> at <*>"
    assert not result.is_new


def test_cluster_count_bounds():
    # drain_test.go:84-108: 5 mixed logs → 2..5 clusters (actual: 3).
    tree = DrainTree(DrainConfig())
    for log in [
        "Pattern A with value 1",
        "Pattern A with value 2",
        "Pattern B with id 100",
        "Pattern B with id 200",
        "Pattern C started",
    ]:
        tree.parse(log, 1)
    assert tree.cluster_count() == 3
    assert 2 <= tree.cluster_count() <= 5


def test_stats():
    # drain_test.go:110-132
    tree = DrainTree(DrainConfig())
    for _ in range(10):
        tree.parse("Request processed in 100ms", 1)
    stats = tree.get_stats()
    assert stats == {"total_clusters": 1, "total_logs": 10, "average_size": 10.0}


def test_empty_log_rejected():
    # drain.go:140-142
    tree = DrainTree(DrainConfig())
    import pytest

    with pytest.raises(ValueError):
        tree.parse("   ", 1)


def test_tokenize_fields_semantics():
    # strings.Fields: any whitespace, no empties (drain.go:172-176)
    assert tokenize("  a\tb\n c  ") == ["a", "b", "c"]
    assert tokenize("") == []


def test_is_variable_vectors():
    # drain.go:106-131,192-206
    assert is_variable("192.168.1.1")
    assert is_variable("192.168.1.1:5432")  # substring IP match
    assert is_variable("550e8400-e29b-41d4-a716-446655440000")  # uuid
    assert is_variable("deadbeefcafe")  # hex >= 8
    assert is_variable("42")
    assert is_variable("1.5")  # ParseFloat
    assert is_variable("1e-5")
    assert is_variable("/var/log/syslog")
    assert is_variable("https://example.com/x")
    assert is_variable("user@example.com")
    assert not is_variable("100ms")  # no \b between 0 and m — NOT a variable
    assert not is_variable("error")
    assert not is_variable("<*>")
    assert not is_variable("v1x")  # single digit inside word


def test_similarity_and_generalize():
    # drain.go:263-276: wildcard in TEMPLATE counts as match
    assert similarity(["a", "<*>", "c"], ["a", "b", "c"]) == 1.0
    assert similarity(["a", "b", "c"], ["a", "x", "c"]) == 2 / 3
    assert similarity(["a"], ["a", "b"]) == 0.0


def test_fnv64a_known_vectors():
    # hash/fnv 64a reference values
    assert fnv64a("") == 0xCBF29CE484222325
    assert fnv64a("a") == 0xAF63DC4C8601EC8C
    assert fnv64a("hello") == 0xA430D84680AABD0B


def test_preprocess_and_extract_roundtrip():
    tokens = tokenize("GET /api/users 200 12ms")
    masked = preprocess_tokens(tokens)
    assert masked == ["GET", "<*>", "<*>", "12ms"]
    variables = extract_variables(" ".join(masked), "GET /api/users 200 12ms")
    assert variables == {"var_0": "/api/users", "var_1": "200"}
