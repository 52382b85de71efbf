"""GitHub / git connector.

Behavior contract (reference services/sync/github.py): overrides ``sync``
with a git-native path — shallow ``clone --single-branch --depth 1`` into a
cache, ``fetch + reset --hard + clean -fd`` on refresh (375-511), mirror of
the repo (or ``gh_path`` subfolder) into the folder; all-branches mode
mirrors every remote branch into ``branches/<name>/`` (549-632); SSH-key or
PAT auth (22-54, 351-365); GitHub metadata sync renders issues / PRs /
workflow runs to markdown files with change tracking (697-788).
"""

from __future__ import annotations

import asyncio
import hashlib
import json
import logging
import os
import shutil
import stat
import subprocess
import tempfile
from datetime import datetime, timezone
from pathlib import Path

from voitta_rag_tpu.config import get_settings
from voitta_rag_tpu.services.sync.base import BaseSyncConnector

logger = logging.getLogger(__name__)

GITHUB_API = "https://api.github.com"


def _run_git(args: list[str], cwd: Path | None = None,
             env: dict | None = None, timeout: int = 600) -> str:
    full_env = dict(os.environ)
    full_env["GIT_TERMINAL_PROMPT"] = "0"
    if env:
        full_env.update(env)
    proc = subprocess.run(
        ["git"] + args, cwd=cwd, env=full_env, capture_output=True,
        text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(f"git {' '.join(args[:2])} failed: "
                           f"{proc.stderr.strip()[:500]}")
    return proc.stdout


def _safe_subpath(base: Path, sub: str | None) -> Path:
    """Contain ``gh_path`` inside the clone: an absolute path or ``..``
    would mirror arbitrary server files into the indexed folder
    (``Path(cache) / "/etc" == Path("/etc")``)."""
    sub = (sub or "").strip().strip("/")
    if not sub:
        return base
    p = Path(sub)
    if p.is_absolute() or ".." in p.parts:
        raise RuntimeError(f"invalid gh_path: {sub!r}")
    return base / p


def _safe_git_arg(value: str, what: str) -> str:
    """Argv guard: repo/branch values come from the sync-config API and (in
    all-branches mode) from ls-remote output; none may parse as a git option
    (``--upload-pack=<cmd>`` would execute commands server-side)."""
    v = (value or "").strip()
    if not v or v.startswith("-") or "\x00" in v:
        raise RuntimeError(f"invalid git {what}: {value!r}")
    return v


class GithubConnector(BaseSyncConnector):
    # -- auth / URLs (reference github.py:22-54, 351-365) --------------------
    def _repo_url(self, source) -> str:
        repo = _safe_git_arg(source.gh_repo, "repo")
        if repo.startswith(("http://", "https://", "git@", "file://", "/")):
            base = repo  # full URL or local path (mirrors, air-gapped tests)
        else:
            base = f"https://github.com/{repo}.git"
        if source.gh_auth_method == "token" and source.gh_pat and \
                base.startswith("https://"):
            user = source.gh_username or "x-access-token"
            base = base.replace("https://", f"https://{user}:{source.gh_pat}@")
        return base

    def _git_env(self, source) -> tuple[dict, Path | None]:
        """SSH-key auth via a temp key file + GIT_SSH_COMMAND."""
        if source.gh_auth_method == "ssh" and source.gh_token:
            key = Path(tempfile.mkstemp(prefix="voitta_ssh_")[1])
            key.write_text(source.gh_token)
            key.chmod(stat.S_IRUSR | stat.S_IWUSR)
            return ({"GIT_SSH_COMMAND":
                     f"ssh -i {key} -o StrictHostKeyChecking=no"}, key)
        return ({}, None)

    def _cache_dir(self, source, branch: str) -> Path:
        key = hashlib.sha256(
            f"{source.gh_repo}#{branch}".encode()).hexdigest()[:16]
        return get_settings().root_path / ".voitta_git" / key

    # -- git plumbing (reference github.py:375-511) --------------------------
    def _clone_or_update(self, source, branch: str) -> Path:
        branch = _safe_git_arg(branch, "branch")
        env, key = self._git_env(source)
        cache = self._cache_dir(source, branch)
        try:
            if (cache / ".git").exists():
                try:
                    _run_git(["fetch", "--depth", "1", "origin", branch],
                             cwd=cache, env=env)
                    _run_git(["reset", "--hard", f"origin/{branch}"],
                             cwd=cache, env=env)
                    _run_git(["clean", "-fd"], cwd=cache, env=env)
                    return cache
                except RuntimeError as e:
                    logger.warning("git update failed (%s); recloning", e)
                    shutil.rmtree(cache, ignore_errors=True)
            cache.parent.mkdir(parents=True, exist_ok=True)
            _run_git(["clone", "--single-branch", "--depth", "1",
                      "-b", branch, self._repo_url(source), str(cache)],
                     env=env)
            return cache
        finally:
            if key is not None:
                key.unlink(missing_ok=True)

    def _remote_branches(self, source) -> list[str]:
        env, key = self._git_env(source)
        try:
            out = _run_git(["ls-remote", "--heads", self._repo_url(source)],
                           env=env)
        finally:
            if key is not None:
                key.unlink(missing_ok=True)
        return [line.split("refs/heads/")[-1]
                for line in out.splitlines() if "refs/heads/" in line]

    def detect_default_branch(self, source) -> str:
        env, key = self._git_env(source)
        try:
            out = _run_git(["ls-remote", "--symref", self._repo_url(source),
                            "HEAD"], env=env)
        finally:
            if key is not None:
                key.unlink(missing_ok=True)
        for line in out.splitlines():
            if line.startswith("ref:"):
                return line.split("refs/heads/")[-1].split()[0]
        return "main"

    @staticmethod
    def _mirror_tree(src: Path, dst: Path) -> tuple[int, int]:
        """Copy src → dst, delete dst files not in src; returns (copied,
        deleted)."""
        copied = deleted = 0
        src_files = {}
        for p in src.rglob("*"):
            rel_parts = p.relative_to(src).parts
            if ".git" in rel_parts:
                continue
            if p.is_file():
                src_files["/".join(rel_parts)] = p
        for rel, p in src_files.items():
            target = dst / rel
            if (not target.exists()
                    or target.stat().st_size != p.stat().st_size
                    or target.stat().st_mtime < p.stat().st_mtime):
                target.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(p, target)
                copied += 1
        if dst.exists():
            for p in dst.rglob("*"):
                if p.is_file() and not p.name.startswith("."):
                    rel = "/".join(p.relative_to(dst).parts)
                    if rel.startswith("_github/"):
                        continue  # metadata files managed separately
                    if rel not in src_files:
                        p.unlink()
                        deleted += 1
            for p in sorted(dst.rglob("*"), reverse=True):
                if p.is_dir() and not any(p.iterdir()):
                    p.rmdir()
        return copied, deleted

    # -- BaseSyncConnector interface ----------------------------------------
    async def list_files(self, source):  # pragma: no cover - sync overridden
        raise NotImplementedError

    async def download_file(self, source, remote_path, local_path):  # pragma: no cover
        raise NotImplementedError

    async def sync(self, source, fs, keep_extensions=None) -> dict:
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, self._sync_blocking,
                                          source, fs)

    def _sync_blocking(self, source, fs) -> dict:
        local_root = fs.resolve(source.folder_path)
        local_root.mkdir(parents=True, exist_ok=True)
        stats = {"downloaded": 0, "deleted": 0, "skipped": 0, "errors": 0}

        if source.gh_all_branches:
            branches = self._remote_branches(source)
            for br in branches:
                cache = self._clone_or_update(source, br)
                src = _safe_subpath(cache, source.gh_path)
                c, d = self._mirror_tree(src, local_root / "branches" / br)
                stats["downloaded"] += c
                stats["deleted"] += d
        else:
            branch = source.gh_branch or self.detect_default_branch(source)
            cache = self._clone_or_update(source, branch)
            src = _safe_subpath(cache, source.gh_path)
            if not src.exists():
                raise RuntimeError(f"path '{source.gh_path}' not in repo")
            c, d = self._mirror_tree(src, local_root)
            stats["downloaded"] += c
            stats["deleted"] += d
            self._write_timestamps(cache, src, local_root)

        # GitHub metadata (issues/PRs/workflow runs) — best effort.
        if source.gh_pat and "/" in (source.gh_repo or ""):
            try:
                n = self._sync_metadata_blocking(source, local_root)
                stats["downloaded"] += n
            except Exception as e:
                logger.warning("github metadata sync failed: %s", e)
        return stats

    def _write_timestamps(self, cache: Path, src: Path,
                          local_root: Path) -> None:
        """HEAD commit date applies to every synced file (shallow clones
        carry no per-file history)."""
        try:
            iso = _run_git(["log", "-1", "--format=%cI"], cwd=cache).strip()
        except RuntimeError:
            iso = datetime.now(timezone.utc).isoformat()
        timestamps = {}
        for p in src.rglob("*"):
            if p.is_file() and ".git" not in p.relative_to(src).parts:
                timestamps["/".join(p.relative_to(src).parts)] = {
                    "modified_at": iso}
        (local_root / ".voitta_timestamps.json").write_text(
            json.dumps(timestamps))

    # -- GitHub API metadata (reference github.py:697-788, renderers 201-346)
    def _api_get(self, source, path: str, params: dict | None = None):
        import httpx

        headers = {"Accept": "application/vnd.github+json"}
        if source.gh_pat:
            headers["Authorization"] = f"Bearer {source.gh_pat}"
        resp = httpx.get(f"{GITHUB_API}{path}", headers=headers,
                         params=params or {}, timeout=30)
        resp.raise_for_status()
        return resp.json()

    @staticmethod
    def _render_issue(issue: dict) -> str:
        lines = [f"# Issue #{issue['number']}: {issue.get('title', '')}", ""]
        lines.append(f"- **State:** {issue.get('state')}")
        lines.append(f"- **Author:** {issue.get('user', {}).get('login')}")
        lines.append(f"- **Created:** {issue.get('created_at')}")
        lines.append(f"- **Updated:** {issue.get('updated_at')}")
        labels = ", ".join(lb["name"] for lb in issue.get("labels", []))
        if labels:
            lines.append(f"- **Labels:** {labels}")
        lines += ["", issue.get("body") or ""]
        return "\n".join(lines)

    @staticmethod
    def _render_pr(pr: dict) -> str:
        lines = [f"# PR #{pr['number']}: {pr.get('title', '')}", ""]
        lines.append(f"- **State:** {pr.get('state')}")
        lines.append(f"- **Author:** {pr.get('user', {}).get('login')}")
        lines.append(f"- **Base:** {pr.get('base', {}).get('ref')} ← "
                     f"**Head:** {pr.get('head', {}).get('ref')}")
        lines.append(f"- **Created:** {pr.get('created_at')}")
        lines += ["", pr.get("body") or ""]
        return "\n".join(lines)

    @staticmethod
    def _render_run(run: dict) -> str:
        return "\n".join([
            f"# Workflow run: {run.get('name')} #{run.get('run_number')}", "",
            f"- **Status:** {run.get('status')} / {run.get('conclusion')}",
            f"- **Branch:** {run.get('head_branch')}",
            f"- **Commit:** {run.get('head_sha', '')[:10]}",
            f"- **Started:** {run.get('run_started_at')}",
            f"- **URL:** {run.get('html_url')}",
        ])

    def _sync_metadata_blocking(self, source, local_root: Path) -> int:
        """Render issues/PRs/workflow-runs to markdown with a revision
        sidecar so unchanged items are skipped."""
        repo = source.gh_repo
        meta_dir = local_root / "_github"
        rev_file = meta_dir / ".voitta_revisions.json"
        revisions = {}
        if rev_file.exists():
            try:
                revisions = json.loads(rev_file.read_text())
            except json.JSONDecodeError:
                pass
        written = 0

        def emit(relname: str, content: str, revision: str, url: str | None):
            nonlocal written
            if revisions.get(relname) == revision:
                return
            path = meta_dir / relname
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(content, encoding="utf-8")
            revisions[relname] = revision
            written += 1

        for issue in self._api_get(source, f"/repos/{repo}/issues",
                                   {"state": "all", "per_page": 100}):
            if "pull_request" in issue:
                continue
            emit(f"issues/issue_{issue['number']}.md",
                 self._render_issue(issue), issue.get("updated_at", ""),
                 issue.get("html_url"))
        for pr in self._api_get(source, f"/repos/{repo}/pulls",
                                {"state": "all", "per_page": 100}):
            emit(f"pulls/pr_{pr['number']}.md", self._render_pr(pr),
                 pr.get("updated_at", ""), pr.get("html_url"))
        runs = self._api_get(source, f"/repos/{repo}/actions/runs",
                             {"per_page": 50})
        for run in runs.get("workflow_runs", []):
            emit(f"actions/run_{run['id']}.md", self._render_run(run),
                 run.get("updated_at", ""), run.get("html_url"))

        meta_dir.mkdir(parents=True, exist_ok=True)
        rev_file.write_text(json.dumps(revisions))
        return written
