"""Pluggable credential/secret resolution for external sources.

The reference never passes a JDBC password around in plain options: it
resolves a Secret Manager *reference* to the secret value right before
building the source (main/common/TransformingReader.java:256-310 via
main/common/SecretsClient.java). This module is that seam without any
GCP dependency, mirroring the repo's own KeyProvider pattern
(functions/tokenizer.py:52): register a provider once, and every
reader that accepts a ``*_secret`` reference resolves it through the
provider — a real Secret Manager / Vault implementation is a plug-in,
not a rewrite.

Providers run DRIVER-side only; the resolved value goes into the JDBC
reader options exactly as an explicit password would.
"""

from __future__ import annotations

import os


class CredentialProvider:
    """Resolve an opaque secret reference to its value."""

    def resolve(self, ref: str) -> str:
        raise NotImplementedError


class StaticCredentialProvider(CredentialProvider):
    """Holds an explicit ref -> secret map (tests, or a caller that
    already fetched its secrets)."""

    def __init__(self, secrets: dict[str, str]):
        self._secrets = dict(secrets)

    def resolve(self, ref: str) -> str:
        try:
            return self._secrets[ref]
        except KeyError:
            raise KeyError(f"no secret registered for reference {ref!r}") from None


class EnvCredentialProvider(CredentialProvider):
    """Reads ``<prefix><REF>`` from the environment (ref uppercased,
    non-alphanumerics mapped to ``_``); raises if unset — registering
    this provider makes the secret MANDATORY, the reference's posture
    (no secret, no source).

    ALIASING, by design: the mapping collapses every non-alphanumeric
    character to ``_``, so refs that differ only in separators —
    ``db/prod``, ``db.prod``, ``db prod`` — all resolve to the SAME
    variable (``ADT_SECRET_DB_PROD``). Environment variable names
    cannot carry the distinction; if two secrets must differ, give
    their refs distinct alphanumeric stems or register a provider
    (Static/Vault/SecretManager) that keys on the raw ref."""

    def __init__(self, prefix: str = "ADT_SECRET_"):
        self.prefix = prefix

    def _var(self, ref: str) -> str:
        return self.prefix + "".join(
            c if c.isalnum() else "_" for c in ref.upper()
        )

    def resolve(self, ref: str) -> str:
        var = self._var(ref)
        val = os.environ.get(var)
        if val is None:
            raise KeyError(f"credential provider requires {var} to be set")
        return val


_credential_provider: CredentialProvider | None = None


def register_credential_provider(provider: CredentialProvider | None) -> None:
    """Install (or with ``None``, clear) the process-wide provider
    consulted by :func:`resolve_credential`."""
    global _credential_provider
    if provider is not None and not isinstance(provider, CredentialProvider):
        raise TypeError("provider must be a CredentialProvider")
    _credential_provider = provider


def resolve_credential(ref: str) -> str:
    """Registered provider > ``ADT_SECRET_<REF>`` env fallback > error.

    The env fallback keeps the zero-config path working (same spirit as
    resolve_root_key's ADT_ROOT_KEY_HEX), but unlike the root key there
    is no dev default: an unresolvable secret reference is always an
    error — a made-up password helps nobody.
    """
    if _credential_provider is not None:
        return _credential_provider.resolve(ref)
    return EnvCredentialProvider().resolve(ref)
