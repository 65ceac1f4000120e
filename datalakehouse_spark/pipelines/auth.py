"""Serving-layer auth/authz — the reference's last §2.12 component.

Two layers, mirrored from the reference deployment:

1. **Bearer-token authentication** (services/telematics_api/main.py:64-70):
   the presented token must be a member of the configured token set,
   else 401.  Tokens map to a principal (user) the authorization layer
   evaluates.
2. **Rule-based authorization** (config/trino/rules.json:1-45,
   Trino's file-based access control): ordered ``catalogs`` rules give
   a user ``all`` / ``read-only`` / ``none`` per catalog (FIRST match
   wins, default none), and ordered ``tables`` rules grant privilege
   sets (SELECT/INSERT/DELETE/UPDATE/OWNERSHIP) per (catalog, schema,
   table) regex (first match wins, default no privileges).  An
   operation is allowed only when BOTH layers permit it — a read-only
   catalog blocks INSERT even if a table rule would grant it, exactly
   how the reference keeps user ``analyst`` read-only
   (rules.json:5,29-34) while ``cleanup`` may mutate (rules.json:6,
   35-41).

The engine consumes this as pure functions in front of the query
compile layer (pipelines/api.py) — no HTTP, fully testable in-process;
a FastAPI wrapper binds ``require_token`` + ``authorize`` as request
dependencies exactly like the reference.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

__all__ = [
    "Unauthorized",
    "Forbidden",
    "require_token",
    "AccessRules",
]

#: Operations the reference's rule file knows (rules.json:18,34,40).
OPERATIONS = ("SELECT", "INSERT", "DELETE", "UPDATE", "OWNERSHIP")


class Unauthorized(PermissionError):
    """401 analog: the bearer token is missing or unknown."""


class Forbidden(PermissionError):
    """403 analog: authenticated but the rules deny the operation."""


def require_token(token: str | None, tokens: Mapping[str, str]) -> str:
    """Authenticate a bearer token; returns the principal (user) it
    maps to.  ``tokens`` is token -> user (the reference keeps a flat
    env-configured token list, main.py:66-70; mapping each token to a
    principal is the natural multi-user extension the rules file
    already assumes)."""
    if not token:
        raise Unauthorized("missing bearer token")
    user = tokens.get(token)
    if user is None:
        raise Unauthorized("Invalid token")  # main.py:70 wording
    return user


def _matches(pattern: str, value: str) -> bool:
    # Trino file-based access control treats rule fields as anchored
    # regexes; absent fields default to ".*"
    return re.fullmatch(pattern, value) is not None


class AccessRules:
    """First-match-wins rule evaluation over the reference's
    rules.json shape (Trino file-based access control semantics)."""

    def __init__(self, rules: Mapping):
        self._catalogs: Sequence[Mapping] = rules.get("catalogs", [])
        self._tables: Sequence[Mapping] = rules.get("tables", [])

    def catalog_access(self, user: str, catalog: str) -> str:
        """'all' | 'read-only' | 'none' — first matching catalog rule;
        no match means none (deny by default)."""
        for rule in self._catalogs:
            if _matches(rule.get("user", ".*"), user) and _matches(
                rule.get("catalog", ".*"), catalog
            ):
                return rule.get("allow", "none")
        return "none"

    def table_privileges(
        self, user: str, catalog: str, schema: str, table: str
    ) -> frozenset[str]:
        """Privilege set from the first matching table rule; no match
        means no privileges."""
        for rule in self._tables:
            if (
                _matches(rule.get("user", ".*"), user)
                and _matches(rule.get("catalog", ".*"), catalog)
                and _matches(rule.get("schema", ".*"), schema)
                and _matches(rule.get("table", ".*"), table)
            ):
                return frozenset(rule.get("privileges", []))
        return frozenset()

    def authorize(
        self, user: str, operation: str, catalog: str, schema: str, table: str
    ) -> None:
        """Raise Forbidden unless BOTH layers allow ``operation``."""
        if operation not in OPERATIONS:
            raise Forbidden(f"unknown operation {operation!r}")
        access = self.catalog_access(user, catalog)
        if access == "none":
            raise Forbidden(f"{user} has no access to catalog {catalog}")
        if access == "read-only" and operation != "SELECT":
            raise Forbidden(
                f"catalog {catalog} is read-only for {user}; {operation} denied"
            )
        if operation not in self.table_privileges(user, catalog, schema, table):
            raise Forbidden(
                f"{user} lacks {operation} on {catalog}.{schema}.{table}"
            )
