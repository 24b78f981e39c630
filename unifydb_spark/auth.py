"""Write-path auth hooks: the reference's built-in tx transform + report
filter (SURVEY T5/T6).

 - new_user_transform (src/unifydb/transact/transforms.clj:25-47 +
   src/unifydb/user.clj:10-19): statements asserting :unifydb/username and
   :unifydb/password on the same entity are rewritten into a salted
   SHA-512 user record (password never stored in clear).
 - filter_auth_facts (src/unifydb/transact/filters.clj:14-29): sensitive
   attributes are redacted from the *returned* tx-report (they remain in
   the store — the filter guards the wire, not the log).
"""

from __future__ import annotations

import base64
import hashlib
import os
from typing import Optional

from unifydb_spark.store import norm_attr

USERNAME_ATTR = "unifydb/username"
PASSWORD_ATTR = "unifydb/password"
SALT_ATTR = "unifydb/salt"

# reference filters.clj:17-21 (i / server-key / stored-key are SCRAM
# fields the reference reserves but does not write today)
AUTH_ATTRS = frozenset(
    {SALT_ATTR, "unifydb/i", "unifydb/server-key", "unifydb/stored-key"}
)


def make_user(username: str, password: str, salt: Optional[bytes] = None) -> dict:
    """Salted SHA-512 user record (reference user.clj:10-19: 64 random
    salt bytes, sha512(password || salt), both base64)."""
    if salt is None:
        salt = os.urandom(64)
    hashed = hashlib.sha512(password.encode("utf-8") + salt).digest()
    return {
        USERNAME_ATTR: username,
        PASSWORD_ATTR: base64.b64encode(hashed).decode("ascii"),
        SALT_ATTR: base64.b64encode(salt).decode("ascii"),
    }


def verify_password(password: str, salt_b64: str, stored_b64: str) -> bool:
    salt = base64.b64decode(salt_b64)
    hashed = hashlib.sha512(password.encode("utf-8") + salt).digest()
    return base64.b64encode(hashed).decode("ascii") == stored_b64


def new_user_transform(stmts: list) -> list:
    """Rewrite (username, password) assertion pairs on one entity into a
    salted user record; all other statements pass through unchanged."""
    username = password = user_eid = None
    for s in stmts:
        if not isinstance(s, (list, tuple)) or len(s) != 4:
            continue
        a = norm_attr(str(s[2]))
        if a == USERNAME_ATTR and username is None:
            username, user_eid = s[3], s[1]
        elif a == PASSWORD_ATTR and password is None:
            password, pw_eid = s[3], s[1]
    if username is None or password is None or user_eid != pw_eid:
        return stmts
    user_stmts = [
        ["add", user_eid, attr, val]
        for attr, val in make_user(username, password).items()
    ]
    kept = [
        s
        for s in stmts
        if not (
            isinstance(s, (list, tuple))
            and len(s) == 4
            and norm_attr(str(s[2])) in (USERNAME_ATTR, PASSWORD_ATTR)
        )
    ]
    return user_stmts + kept


def filter_auth_facts(report: dict) -> dict:
    """Redact sensitive auth attrs from the tx-report's fact list."""
    report = dict(report)
    report["tx_data"] = [
        f for f in report.get("tx_data", []) if norm_attr(str(f[1])) not in AUTH_ATTRS
    ]
    return report


# ---------------------------------------------------------------------------
# token auth (reference src/unifydb/auth.clj): SCRAM-ish two-step login +
# signed token. The reference signs with buddy JWT; here the token is an
# HMAC-SHA256-signed payload (same shape: username/roles/created).

import hmac as _hmac
import json as _json
import time as _time

TOKEN_TTL_SECONDS = 3600
NONCE_TTL_SECONDS = 60


def make_token(username: str, secret: bytes, roles=("unifydb/user",),
               now: Optional[float] = None) -> str:
    payload = _json.dumps(
        {"username": username, "roles": list(roles),
         "created": now if now is not None else _time.time()},
        sort_keys=True,
    ).encode()
    sig = _hmac.new(secret, payload, hashlib.sha256).hexdigest()
    return base64.urlsafe_b64encode(payload).decode() + "." + sig


def validate_token(token: str, secret: bytes,
                   now: Optional[float] = None) -> Optional[dict]:
    """Returns the auth map, or None if the signature or TTL fails
    (reference validate-jwt auth.clj:18-31)."""
    try:
        body_b64, sig = token.split(".", 1)
        payload = base64.urlsafe_b64decode(body_b64.encode())
    except (ValueError, TypeError):
        return None
    want = _hmac.new(secret, payload, hashlib.sha256).hexdigest()
    if not _hmac.compare_digest(want, sig):
        return None
    data = _json.loads(payload)
    now = now if now is not None else _time.time()
    if now - data.get("created", 0) >= TOKEN_TTL_SECONDS:
        return None
    return data


def login_challenge(engine, cache, username: str) -> Optional[dict]:
    """Step 1 (reference login-get-salt-handler auth.clj:57-81): random
    nonce cached 60 s under a nonce-key; returns the user's salt so the
    client can hash its password the same way the store did."""
    user = get_user(engine, username)
    if user is None:
        return None
    nonce = base64.b64encode(os.urandom(64)).decode()
    nonce_key = base64.b64encode(os.urandom(16)).decode()
    cache.set(nonce_key, nonce, NONCE_TTL_SECONDS)
    return {
        "username": username,
        "salt": user[SALT_ATTR],
        "nonce-key": nonce_key,
        "nonce": nonce,
    }


def login(engine, cache, secret: bytes, username: str, hashed_password: str,
          nonce_key: str, client_nonce: str) -> Optional[str]:
    """Step 2 (reference login-handler auth.clj:83-103): nonce must match
    the cached challenge and the client's salted hash must equal the
    stored one; returns a signed token or None."""
    user = get_user(engine, username)
    nonce = cache.get(nonce_key)
    if (
        user is not None
        and nonce is not None
        and _hmac.compare_digest(client_nonce, nonce)
        and _hmac.compare_digest(hashed_password, user[PASSWORD_ATTR])
    ):
        cache.delete(nonce_key)
        return make_token(username, secret)
    return None


def client_hash(password: str, salt_b64: str) -> str:
    """What a client sends at login: the same salted SHA-512, base64."""
    salt = base64.b64decode(salt_b64)
    return base64.b64encode(
        hashlib.sha512(password.encode("utf-8") + salt).digest()
    ).decode("ascii")


def get_user(engine, username: str) -> Optional[dict]:
    """Look up a user record by username via a Datalog query (reference
    user.clj:21-37 — its get-user! is itself a query)."""
    rows = engine.query_rows(
        {
            "find": ["?password", "?salt"],
            "where": [
                ["?e", ":unifydb/username", "?username"],
                ["?e", ":unifydb/password", "?password"],
                ["?e", ":unifydb/salt", "?salt"],
            ],
            "bind": {"username": username},
        }
    )
    if not rows:
        return None
    password, salt = rows[0]
    return {USERNAME_ATTR: username, PASSWORD_ATTR: password, SALT_ATTR: salt}
