"""Shared Microsoft Graph helpers (SharePoint / Teams connectors).

OAuth2 refresh-token flow (reference sharepoint.py:86-131, 191-230): access
tokens are minted on demand from the stored refresh token.
"""

from __future__ import annotations

import logging

import httpx

logger = logging.getLogger(__name__)

GRAPH = "https://graph.microsoft.com/v1.0"
LOGIN = "https://login.microsoftonline.com"


def get_auth_url(tenant_id: str, client_id: str, redirect_uri: str,
                 state: str,
                 scope: str = "offline_access "
                              "https://graph.microsoft.com/.default") -> str:
    """Authorization-code URL for the OAuth popup flow
    (reference sharepoint.py get_auth_url / sync.py:390-453)."""
    from urllib.parse import urlencode

    return f"{LOGIN}/{tenant_id}/oauth2/v2.0/authorize?" + urlencode({
        "client_id": client_id,
        "response_type": "code",
        "redirect_uri": redirect_uri,
        "response_mode": "query",
        "scope": scope,
        "state": state,
    })


def exchange_code_for_tokens(tenant_id: str, client_id: str,
                             client_secret: str, code: str,
                             redirect_uri: str,
                             scope: str = "offline_access "
                                          "https://graph.microsoft.com/.default"
                             ) -> dict:
    """Authorization-code → token exchange; returns the token response
    (``refresh_token`` is what gets persisted)."""
    resp = httpx.post(
        f"{LOGIN}/{tenant_id}/oauth2/v2.0/token",
        data={
            "client_id": client_id,
            "client_secret": client_secret,
            "grant_type": "authorization_code",
            "code": code,
            "redirect_uri": redirect_uri,
            "scope": scope,
        }, timeout=30)
    resp.raise_for_status()
    return resp.json()


def list_sites(tenant_id: str, client_id: str, client_secret: str,
               refresh_token: str) -> list[dict]:
    """All SharePoint sites visible to the connected user
    (reference sharepoint.py list_sites / sync.py:575-610)."""
    tokens = refresh_access_token(tenant_id, client_id, client_secret,
                                  refresh_token)
    client = GraphClient(tokens["access_token"])
    sites = client.get_paged("/sites?search=*")
    return [{"id": s.get("id"), "name": s.get("displayName") or s.get("name"),
             "webUrl": s.get("webUrl")} for s in sites]


def refresh_access_token(tenant_id: str, client_id: str, client_secret: str,
                         refresh_token: str,
                         scope: str = "https://graph.microsoft.com/.default") -> dict:
    resp = httpx.post(
        f"{LOGIN}/{tenant_id}/oauth2/v2.0/token",
        data={
            "client_id": client_id,
            "client_secret": client_secret,
            "grant_type": "refresh_token",
            "refresh_token": refresh_token,
            "scope": scope,
        }, timeout=30)
    resp.raise_for_status()
    return resp.json()


class GraphClient:
    def __init__(self, access_token: str):
        self.token = access_token

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.token}"}

    def get(self, path: str, params: dict | None = None) -> dict:
        url = path if path.startswith("http") else f"{GRAPH}{path}"
        resp = httpx.get(url, headers=self._headers(), params=params,
                         timeout=60)
        resp.raise_for_status()
        return resp.json()

    def get_paged(self, path: str, params: dict | None = None) -> list[dict]:
        out = []
        data = self.get(path, params)
        out.extend(data.get("value", []))
        while "@odata.nextLink" in data:
            data = self.get(data["@odata.nextLink"])
            out.extend(data.get("value", []))
        return out

    def download(self, url: str, target) -> None:
        with httpx.stream("GET", url, headers=self._headers(), timeout=300,
                          follow_redirects=True) as resp:
            resp.raise_for_status()
            with open(target, "wb") as f:
                for chunk in resp.iter_bytes(1 << 20):
                    f.write(chunk)

    def batch(self, requests: list[dict]) -> list[dict]:
        """Graph $batch (reference sharepoint.py ACL fetch via $batch)."""
        out = []
        for i in range(0, len(requests), 20):
            resp = httpx.post(f"{GRAPH}/$batch", headers=self._headers(),
                              json={"requests": requests[i:i + 20]},
                              timeout=60)
            resp.raise_for_status()
            out.extend(resp.json().get("responses", []))
        return out
