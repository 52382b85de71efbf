"""Teams meeting transcripts (reference services/sync/teams_transcripts.py:
15-179): post-SharePoint-sync pass that parses ``.url`` meeting shortcuts in
the synced tree, resolves Graph onlineMeetings, and downloads VTT transcripts
next to the shortcuts (then indexed by the VTT parser)."""

from __future__ import annotations

import asyncio
import configparser
import logging
import re
from pathlib import Path

from voitta_rag_tpu.services.sync.msgraph import GraphClient, refresh_access_token

logger = logging.getLogger(__name__)

_MEETING_RE = re.compile(r"meetup-join/([^/?]+)")


def parse_url_shortcut(path: Path) -> str | None:
    """Extract the URL from a Windows .url shortcut file."""
    try:
        cp = configparser.ConfigParser(interpolation=None)
        cp.read_string(path.read_text(errors="replace"))
        return cp.get("InternetShortcut", "URL", fallback=None)
    except (configparser.Error, OSError):
        return None


async def fetch_transcripts_for_folder(source, fs) -> int:
    """Find meeting shortcuts under the folder and fetch their transcripts."""
    loop = asyncio.get_running_loop()
    root = fs.resolve(source.folder_path)
    shortcuts = [p for p in root.rglob("*.url")]
    if not shortcuts:
        return 0
    tokens = await loop.run_in_executor(
        None, refresh_access_token, source.sp_tenant_id, source.sp_client_id,
        source.sp_client_secret, source.sp_refresh_token)
    client = GraphClient(tokens["access_token"])
    fetched = 0
    for shortcut in shortcuts:
        url = parse_url_shortcut(shortcut)
        if not url or "meetup-join" not in url:
            continue
        m = _MEETING_RE.search(url)
        if not m:
            continue
        join_id = m.group(1)
        try:
            meetings = await loop.run_in_executor(
                None, client.get_paged,
                f"/me/onlineMeetings?$filter=joinWebUrl eq '{url}'")
            for meeting in meetings:
                transcripts = await loop.run_in_executor(
                    None, client.get_paged,
                    f"/me/onlineMeetings/{meeting['id']}/transcripts")
                for i, t in enumerate(transcripts):
                    target = shortcut.with_suffix(
                        f".transcript{i if i else ''}.vtt")
                    await loop.run_in_executor(
                        None, client.download,
                        f"https://graph.microsoft.com/v1.0/me/onlineMeetings/"
                        f"{meeting['id']}/transcripts/{t['id']}/content"
                        f"?$format=text/vtt", target)
                    fetched += 1
        except Exception as e:
            logger.warning("transcript fetch failed for %s: %s",
                           shortcut.name, e)
    return fetched
