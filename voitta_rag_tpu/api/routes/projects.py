"""Projects CRUD (reference api/routes/projects.py:65-103): list, create,
delete (default-project protected), select active."""

from __future__ import annotations

from aiohttp import web

from voitta_rag_tpu.api.routes.helpers import json_error, require_user
from voitta_rag_tpu.db.database import get_db
from voitta_rag_tpu.db.models import Project


@require_user
async def list_projects(request: web.Request, user) -> web.Response:
    db = get_db()
    active = db.get_active_project(user)
    return web.json_response({
        "projects": [
            {"id": p.id, "name": p.name, "is_default": p.is_default,
             "is_active": p.id == active.id}
            for p in db.list_projects(user.id)
        ]})


@require_user
async def create_project(request: web.Request, user) -> web.Response:
    body = await request.json()
    name = (body.get("name") or "").strip()
    if not name:
        return json_error(400, "project name required")
    db = get_db()
    if any(p.name == name for p in db.list_projects(user.id)):
        return json_error(409, "project already exists")
    proj = Project(name=name, user_id=user.id, is_default=False)
    db.insert("projects", proj)
    return web.json_response({"id": proj.id, "name": proj.name}, status=201)


@require_user
async def delete_project(request: web.Request, user) -> web.Response:
    pid = int(request.match_info["project_id"])
    db = get_db()
    proj = db.get("projects", Project, pid)
    if proj is None or proj.user_id != user.id:
        return json_error(404, "project not found")
    if proj.is_default:
        return json_error(400, "cannot delete the default project")
    db.execute("DELETE FROM project_folder_settings WHERE project_id=?", (pid,))
    db.execute("DELETE FROM projects WHERE id=?", (pid,))
    if user.active_project_id == pid:
        default = db.ensure_default_project(user)
        db.execute("UPDATE users SET active_project_id=? WHERE id=?",
                   (default.id, user.id))
    return web.json_response({"deleted": pid})


@require_user
async def select_project(request: web.Request, user) -> web.Response:
    pid = int(request.match_info["project_id"])
    db = get_db()
    proj = db.get("projects", Project, pid)
    if proj is None or proj.user_id != user.id:
        return json_error(404, "project not found")
    db.execute("UPDATE users SET active_project_id=? WHERE id=?",
               (pid, user.id))
    return web.json_response({"active_project": pid})


def setup(app: web.Application) -> None:
    app.router.add_get("/api/projects", list_projects)
    app.router.add_post("/api/projects", create_project)
    app.router.add_delete("/api/projects/{project_id:\\d+}", delete_project)
    app.router.add_post("/api/projects/{project_id:\\d+}/select",
                        select_project)
