"""Serving auth/authz tests — the reference deployment's exact rule
matrix (config/trino/rules.json:1-45) evaluated through the engine's
in-process shim."""

import pytest

from datalakehouse_spark.pipelines.auth import (
    AccessRules,
    Forbidden,
    Unauthorized,
    require_token,
)

# the reference's rules.json, verbatim semantics (user/catalog regexes,
# first match wins, deny by default)
RULES = {
    "catalogs": [
        {"user": "ANONYMOUS", "catalog": ".*", "allow": "none"},
        {"user": "admin", "catalog": ".*", "allow": "all"},
        {"user": "analyst", "catalog": "nessie", "allow": "read-only"},
        {"user": "cleanup", "catalog": "nessie", "allow": "all"},
        {"user": "hardware", "catalog": "nessie", "allow": "read-only"},
    ],
    "tables": [
        {
            "user": "admin",
            "catalog": ".*",
            "schema": ".*",
            "table": ".*",
            "privileges": ["SELECT", "INSERT", "DELETE", "UPDATE", "OWNERSHIP"],
        },
        {
            "user": "analyst",
            "catalog": "nessie",
            "schema": "telematics",
            "table": ".*",
            "privileges": ["SELECT"],
        },
        {
            "user": "cleanup",
            "catalog": "nessie",
            "schema": "telematics",
            "table": ".*",
            "privileges": ["SELECT", "INSERT", "DELETE", "UPDATE"],
        },
        {
            "user": "hardware",
            "catalog": "nessie",
            "schema": "telematics",
            "table": ".*",
            "privileges": ["SELECT"],
        },
    ],
}

TOKENS = {"tok-analyst": "analyst", "tok-admin": "admin", "tok-cleanup": "cleanup"}


def test_bearer_token_membership():
    assert require_token("tok-analyst", TOKENS) == "analyst"
    with pytest.raises(Unauthorized):
        require_token("tok-unknown", TOKENS)
    with pytest.raises(Unauthorized):
        require_token(None, TOKENS)
    with pytest.raises(Unauthorized):
        require_token("", TOKENS)


@pytest.fixture(scope="module")
def rules():
    return AccessRules(RULES)


def test_analyst_is_read_only(rules):
    """rules.json:5,29-34 — the serving user can SELECT and nothing
    else; both the catalog layer and the privilege layer must agree."""
    rules.authorize("analyst", "SELECT", "nessie", "telematics", "telematics_real_time")
    for op in ("INSERT", "DELETE", "UPDATE", "OWNERSHIP"):
        with pytest.raises(Forbidden):
            rules.authorize("analyst", op, "nessie", "telematics", "risk_score_daily")


def test_cleanup_may_mutate_but_not_own(rules):
    """rules.json:6,35-41 — the maintenance user mutates telematics
    tables; OWNERSHIP (DDL) stays admin-only."""
    for op in ("SELECT", "INSERT", "DELETE", "UPDATE"):
        rules.authorize("cleanup", op, "nessie", "telematics", "telematics_real_time")
    with pytest.raises(Forbidden):
        rules.authorize("cleanup", "OWNERSHIP", "nessie", "telematics", "x")


def test_admin_everything_everywhere(rules):
    for op in ("SELECT", "INSERT", "DELETE", "UPDATE", "OWNERSHIP"):
        rules.authorize("admin", op, "anycat", "anyschema", "anytable")


def test_anonymous_and_unknown_denied(rules):
    """rules.json:3 — ANONYMOUS matches the catch-all none rule FIRST
    (ordered evaluation); unknown users fall through to deny-by-default."""
    with pytest.raises(Forbidden):
        rules.authorize("ANONYMOUS", "SELECT", "nessie", "telematics", "t")
    with pytest.raises(Forbidden):
        rules.authorize("stranger", "SELECT", "nessie", "telematics", "t")


def test_catalog_scope_is_enforced(rules):
    """analyst's read-only grant names catalog 'nessie' only — another
    catalog does not match any rule and denies."""
    with pytest.raises(Forbidden):
        rules.authorize("analyst", "SELECT", "other_catalog", "telematics", "t")


def test_schema_scope_is_enforced(rules):
    """analyst's table privileges are scoped to schema 'telematics';
    catalog access alone is not enough."""
    with pytest.raises(Forbidden):
        rules.authorize("analyst", "SELECT", "nessie", "secret_schema", "t")


def test_regexes_are_anchored(rules):
    """'nessie' must not match 'nessie_prod' — Trino's file-based rules
    are full-string regexes, not substring matches."""
    with pytest.raises(Forbidden):
        rules.authorize("analyst", "SELECT", "nessie_prod", "telematics", "t")


def test_unknown_operation_rejected(rules):
    with pytest.raises(Forbidden):
        rules.authorize("admin", "DROP", "nessie", "telematics", "t")


def test_serving_request_path_end_to_end(rules):
    """The main.py flow in-process: token -> principal -> authorize the
    page query's SELECT -> compile params.  A mutation with the same
    token dies at the authz gate before any plan is built."""
    from datalakehouse_spark.pipelines.api import validate_page

    user = require_token("tok-analyst", TOKENS)
    rules.authorize(user, "SELECT", "nessie", "telematics", "telematics_real_time")
    assert validate_page(50, 10) == (50, 10)
    with pytest.raises(Forbidden):
        rules.authorize(user, "DELETE", "nessie", "telematics", "telematics_real_time")
