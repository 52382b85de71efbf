/* voitta-rag tpu frontend (contract: reference static/js/app.js —
   theme toggle, WebSocket live refresh, toggles, search, upload, details). */
(function () {
  "use strict";

  // ---- theme (reference app.js:9-25) ----
  const root = document.documentElement;
  const saved = localStorage.getItem("theme");
  if (saved) root.setAttribute("data-theme", saved);
  const themeBtn = document.getElementById("theme-toggle");
  if (themeBtn) themeBtn.onclick = () => {
    const next = root.getAttribute("data-theme") === "dark" ? "light" : "dark";
    root.setAttribute("data-theme", next);
    localStorage.setItem("theme", next);
  };

  const browser = document.querySelector(".browser");
  if (!browser) return;
  const currentPath = browser.dataset.path || "";

  function toast(msg) {
    const el = document.createElement("div");
    el.className = "toast";
    el.textContent = msg;
    document.body.appendChild(el);
    setTimeout(() => el.remove(), 2500);
  }

  async function api(method, url, body) {
    const opts = { method, headers: {} };
    if (body !== undefined) {
      opts.headers["Content-Type"] = "application/json";
      opts.body = JSON.stringify(body);
    }
    const resp = await fetch(url, opts);
    if (!resp.ok) {
      const detail = await resp.json().catch(() => ({}));
      throw new Error(detail.detail || resp.statusText);
    }
    return resp.json();
  }

  // ---- delayed spinner (reference app.js:942-970) ----
  // Reference-counted: concurrent operations (upload + search) each call
  // show/hide; the overlay survives until the LAST one finishes.
  let spinnerCount = 0;
  const spinnerTimers = new Set();
  function showSpinner(delay = 150) {
    spinnerCount++;
    const timer = setTimeout(() => {
      spinnerTimers.delete(timer);
      if (document.getElementById("spinner-overlay")) return;
      const el = document.createElement("div");
      el.id = "spinner-overlay";
      el.innerHTML = `<div class="spinner"></div>`;
      document.body.appendChild(el);
    }, delay);
    spinnerTimers.add(timer);
  }
  function hideSpinner() {
    spinnerCount = Math.max(0, spinnerCount - 1);
    if (spinnerCount > 0) return;
    for (const t of spinnerTimers) clearTimeout(t);
    spinnerTimers.clear();
    const el = document.getElementById("spinner-overlay");
    if (el) el.remove();
  }

  // AJAX fragment refresh (reference pages.py:381-402): re-fetch only the
  // file-list rows; handlers survive because they're delegated to the tbody.
  const listBody = document.getElementById("file-list-body");
  let refreshing = false;
  async function refreshList() {
    if (!listBody) { location.reload(); return; }
    if (refreshing) return;
    refreshing = true;
    try {
      const resp = await fetch(
        `/api/browse-list?path=${encodeURIComponent(currentPath)}`);
      if (!resp.ok) throw new Error(resp.statusText);
      listBody.innerHTML = await resp.text();
      applySort();
      updateFooter();
    } catch (_) {
      location.reload();
    } finally {
      refreshing = false;
    }
  }

  // ---- column sorting (reference app.js:2349-2415 sortFileList) ----
  const sortState = { key: null, dir: 1 };
  function applySort() {
    if (!listBody || !sortState.key) return;
    const rows = [...listBody.querySelectorAll("tr[data-path]")];
    const key = sortState.key, dir = sortState.dir;
    rows.sort((a, b) => {
      // Folders group before files regardless of sort direction.
      const ad = /^t/i.test(a.dataset.dir), bd = /^t/i.test(b.dataset.dir);
      if (ad !== bd) return ad ? -1 : 1;
      let av, bv;
      if (key === "size" || key === "chunks") {
        av = Number(a.dataset[key] || 0); bv = Number(b.dataset[key] || 0);
        return (av - bv) * dir;
      }
      av = a.dataset[key === "status" ? "status" : "name"] || "";
      bv = b.dataset[key === "status" ? "status" : "name"] || "";
      return av.localeCompare(bv) * dir;
    });
    for (const r of rows) listBody.appendChild(r);
    for (const th of document.querySelectorAll("th.sortable")) {
      const ind = th.querySelector(".sort-ind");
      if (ind) ind.textContent =
        th.dataset.sort === sortState.key ? (dir > 0 ? "▲" : "▼") : "";
    }
  }
  for (const th of document.querySelectorAll("th.sortable")) {
    th.onclick = () => {
      if (sortState.key === th.dataset.sort) sortState.dir *= -1;
      else { sortState.key = th.dataset.sort; sortState.dir = 1; }
      applySort();
    };
  }

  // ---- footer stats (reference updateFileListFooter) ----
  function updateFooter() {
    const footer = document.getElementById("file-list-footer");
    if (!footer || !listBody) return;
    const rows = [...listBody.querySelectorAll("tr[data-path]")];
    let dirs = 0, files = 0, chunks = 0, bytes = 0;
    for (const r of rows) {
      if (/^t/i.test(r.dataset.dir)) dirs++; else files++;
      chunks += Number(r.dataset.chunks || 0);
      bytes += Number(r.dataset.size || 0);
    }
    footer.textContent = rows.length
      ? `${dirs} folders · ${files} files · ${chunks.toLocaleString()} chunks` +
        (bytes ? ` · ${fmtSize(bytes)}` : "")
      : "";
  }

  // ---- WebSocket live events (reference app.js:45-274) ----
  function initWebSocket() {
    const proto = location.protocol === "https:" ? "wss" : "ws";
    const ws = new WebSocket(`${proto}://${location.host}/ws`);
    let debounce = null;
    ws.onmessage = (ev) => {
      const msg = JSON.parse(ev.data);
      if (msg.type === "ping") return;
      if (["created", "deleted", "modified", "moved"].includes(msg.type)) {
        clearTimeout(debounce);
        debounce = setTimeout(refreshList, 800);
      } else if (msg.type === "sync_status") {
        toast(`Sync ${msg.status}: ${msg.folder}`);
        clearTimeout(debounce);
        debounce = setTimeout(refreshList, 800);
      } else if (msg.type === "index_status" || msg.type === "index_complete") {
        toast(`Index ${msg.status}: ${msg.folder}`);
        clearTimeout(debounce);
        debounce = setTimeout(refreshList, 800);
      } else if (msg.type && msg.type.endsWith("_connected")) {
        // OAuth popup finished (reference updateSpConnectStatus etc.):
        // surface it in an open sync modal as well as a toast.
        toast(`${msg.type.replace("_connected", "")} connected: ${msg.path}`);
        const st = document.getElementById("oauth-status");
        if (st) { st.textContent = "Connected ✓"; st.className = "oauth-ok"; }
      }
    };
    ws.onclose = () => setTimeout(initWebSocket, 5000);
  }
  initWebSocket();

  // ---- search ----
  const searchInput = document.getElementById("search-input");
  const searchBtn = document.getElementById("search-btn");
  const searchResults = document.getElementById("search-results");
  async function runSearch() {
    const q = searchInput.value.trim();
    if (!q) { searchResults.classList.add("hidden"); return; }
    showSpinner();
    let data;
    try {
      data = await api("GET",
        `/api/search?q=${encodeURIComponent(q)}&limit=10`);
    } finally { hideSpinner(); }
    searchResults.innerHTML = "";
    if (!data.results.length) {
      searchResults.textContent = "No results.";
    }
    // Highlight query terms (>= 3 chars). Match on the RAW text and escape
    // each piece separately — running the regex over escaped HTML would
    // split entities (searching "amp" must not corrupt an "&amp;").
    const terms = q.split(/\s+/).filter((t) => t.length >= 3)
      .map((t) => t.replace(/[.*+?^${}()|[\]\\]/g, "\\$&"));
    const hl = terms.length ? new RegExp(terms.join("|"), "gi") : null;
    function mark(s) {
      if (!hl) return esc(s);
      let out = "", last = 0;
      for (const m of s.matchAll(hl)) {
        out += esc(s.slice(last, m.index)) +
          `<mark>${esc(m[0])}</mark>`;
        last = m.index + m[0].length;
      }
      return out + esc(s.slice(last));
    }
    for (const r of data.results) {
      const dir = r.file_path.includes("/")
        ? r.file_path.slice(0, r.file_path.lastIndexOf("/")) : "";
      const div = document.createElement("div");
      div.className = "result";
      div.innerHTML =
        `<div class="meta"><span class="score">${r.score.toFixed(3)}</span> ` +
        `— <a href="/browse?path=${encodeURIComponent(dir)}">${esc(r.file_path)}</a>` +
        ` · chunk ${r.chunk_index + 1}/${r.total_chunks}` +
        (r.memory_id ? " · memory" : "") + `</div>` +
        `<div>${mark(r.text.slice(0, 400))}</div>`;
      searchResults.appendChild(div);
    }
    searchResults.classList.remove("hidden");
  }
  if (searchBtn) searchBtn.onclick = () => runSearch().catch(e => toast(e.message));
  if (searchInput) searchInput.addEventListener("keydown", (e) => {
    if (e.key === "Enter") runSearch().catch(err => toast(err.message));
  });

  // ---- modal scaffolding (sync config, projects) ----
  function openModal(title) {
    closeModal();
    const overlay = document.createElement("div");
    overlay.className = "modal-overlay";
    overlay.id = "modal-overlay";
    overlay.innerHTML =
      `<div class="modal"><div class="modal-head"><h3>${esc(title)}</h3>` +
      `<button class="modal-close">✕</button></div>` +
      `<div class="modal-body"></div></div>`;
    document.body.appendChild(overlay);
    overlay.querySelector(".modal-close").onclick = closeModal;
    overlay.onclick = (e) => { if (e.target === overlay) closeModal(); };
    return overlay.querySelector(".modal-body");
  }
  function closeModal() {
    const el = document.getElementById("modal-overlay");
    if (el) el.remove();
  }

  // ---- sync source config (reference app.js:987-2100, schema-driven) ----
  const FIELD_LABELS = {
    fs_path: "Host path", gh_repo: "Repository (owner/name or URL)",
    gh_branch: "Branch", gh_path: "Subfolder (optional)",
    gh_auth_method: "Auth method (ssh/pat)", gh_username: "Username",
    gh_all_branches: "Sync all branches (true/false)",
    gh_token: "Token", gh_pat: "Personal access token",
    sp_tenant_id: "Tenant ID", sp_client_id: "Client ID",
    sp_site_url: "Site URL", sp_drive_id: "Drive ID (optional)",
    sp_all_sites: "All sites (true/false)",
    sp_selected_sites: "Selected sites (comma-sep)",
    sp_client_secret: "Client secret", sp_refresh_token: "Refresh token",
    gd_folder_id: "Folder ID", gd_client_id: "Client ID",
    gd_service_account_json: "Service account JSON",
    gd_client_secret: "Client secret", gd_refresh_token: "Refresh token",
    ado_tenant_id: "Tenant ID", ado_client_id: "Client ID",
    ado_organization: "Organization", ado_project: "Project",
    ado_url: "Org URL", ado_client_secret: "Client secret",
    ado_refresh_token: "Refresh token",
    jira_url: "Jira URL", jira_project: "Project key(s) or *",
    jira_auth_method: "Auth method (cloud/server)", jira_email: "Email",
    jira_token: "API token",
    confluence_url: "Confluence URL", confluence_space: "Space key(s)",
    confluence_auth_method: "Auth method (cloud/server)",
    confluence_email: "Email", confluence_token: "API token",
    box_client_id: "Client ID", box_folder_id: "Folder ID",
    box_client_secret: "Client secret", box_refresh_token: "Refresh token",
    glue_region: "AWS region", glue_profile: "AWS profile (optional)",
    glue_catalog_id: "Catalog ID (optional)",
    glue_databases: "Databases (comma-sep or *)",
    glue_access_key_id: "Access key ID",
    glue_secret_access_key: "Secret access key",
  };

  // Server-side lookup helpers feeding pickers next to their fields
  // (reference app.js multiselects: branches/sites/spaces/projects/dirs).
  const LOOKUPS = {
    github: { gh_branch: { url: (p) => `/api/sync/${p}/branches`, key: "branches" } },
    jira: { jira_project: { url: (p) => `/api/sync/${p}/jira-projects`, key: "projects", multi: true } },
    confluence: { confluence_space: { url: (p) => `/api/sync/${p}/confluence-spaces`, key: "spaces", multi: true } },
    sharepoint: { sp_selected_sites: { url: (p) => `/api/sync/${p}/sp-sites`, key: "sites", multi: true } },
    google_drive: { gd_folder_id: { url: (p) => `/api/sync/${p}/gdrive-folders`, key: "folders" } },
  };

  function optionValue(x) {
    if (typeof x === "string") return x;
    return x.key || x.id || x.name || JSON.stringify(x);
  }
  function optionLabel(x) {
    if (typeof x === "string") return x;
    const v = optionValue(x);
    return x.name && x.name !== v ? `${x.name} (${v})` : v;
  }

  function attachLookup(input, spec, path, multi) {
    const btn = document.createElement("button");
    btn.type = "button";
    btn.className = "lookup-btn";
    btn.textContent = "Browse…";
    input.after(btn);
    btn.onclick = async () => {
      btn.disabled = true;
      try {
        const data = await api("GET", spec.url(path));
        const items = data[spec.key] || data.items || [];
        if (!items.length) { toast("Nothing found"); return; }
        const old = btn.nextElementSibling;
        if (old && old.tagName === "SELECT") old.remove();
        const sel = document.createElement("select");
        const first = document.createElement("option");
        first.value = "";
        first.textContent = "— pick —";
        sel.appendChild(first);
        for (const x of items) {
          // DOM text assignment, not innerHTML: remote-service names
          // (branches/spaces/sites) are untrusted content.
          const opt = document.createElement("option");
          opt.value = String(optionValue(x));
          opt.textContent = optionLabel(x);
          sel.appendChild(opt);
        }
        btn.after(sel);
        sel.onchange = () => {
          if (!sel.value) return;
          if (multi && input.value.trim()) {
            const parts = input.value.split(",").map((s) => s.trim());
            if (!parts.includes(sel.value)) parts.push(sel.value);
            input.value = parts.join(",");
          } else {
            input.value = sel.value;
          }
        };
      } catch (e) { toast(e.message); }
      finally { btn.disabled = false; }
    };
  }

  function attachDirBrowser(input) {
    const btn = document.createElement("button");
    btn.type = "button";
    btn.className = "lookup-btn";
    btn.textContent = "Browse…";
    input.after(btn);
    btn.onclick = async () => {
      const start = input.value.trim() || "/";
      let box = btn.nextElementSibling;
      if (box && box.classList && box.classList.contains("dir-browser")) box.remove();
      box = document.createElement("div");
      box.className = "dir-browser";
      btn.after(box);
      async function show(path) {
        try {
          const entries = await api("GET",
            `/api/sync/browse-host-dirs?path=${encodeURIComponent(path)}`);
          box.innerHTML =
            `<div class="dir-current"><code>${esc(path)}</code> ` +
            `<button type="button" class="dir-use">Use this</button></div>` +
            entries.map((e2) =>
              `<div class="dir-entry" data-path="${esc(e2.path)}">📁 ${esc(e2.name)}</div>`
            ).join("");
          box.querySelector(".dir-use").onclick = () => {
            input.value = path;
            box.remove();
          };
          for (const el of box.querySelectorAll(".dir-entry")) {
            el.onclick = () => show(el.dataset.path);
          }
        } catch (e) { toast(e.message); box.remove(); }
      }
      await show(start);
    };
  }

  function fieldRow(name, value, isSecret) {
    const label = FIELD_LABELS[name] || name;
    const type = isSecret ? "password" : "text";
    const ph = isSecret && value === "***" ? "(configured — leave blank to keep)" : "";
    const val = isSecret ? "" : (value ?? "");
    return `<label class="form-row"><span>${label}</span>` +
      `<input name="${name}" type="${type}" value="${String(val)
        .replace(/"/g, "&quot;")}" placeholder="${ph}"></label>`;
  }

  async function openSyncModal(path) {
    const [typesResp, existing] = await Promise.all([
      api("GET", "/api/sync/types"),
      api("GET", `/api/sync/${path}`).catch(() => null),
    ]);
    const types = typesResp.types;
    const body = openModal(`Sync source — ${path}`);
    const cur = existing && existing.source_type;
    body.innerHTML =
      `<label class="form-row"><span>Source type</span>` +
      `<select id="sync-type"><option value="">— none —</option>` +
      Object.keys(types).map((t) =>
        `<option value="${t}" ${t === cur ? "selected" : ""}>${t}</option>`
      ).join("") + `</select></label>` +
      `<form id="sync-form"></form>` +
      `<div class="modal-actions">` +
      `<button id="sync-save">Save</button>` +
      `<button id="sync-connect" class="hidden">Connect…</button>` +
      `<span id="oauth-status"></span>` +
      (existing ? `<button id="sync-trigger">Sync now</button>` +
                  `<button id="sync-remove" class="danger">Remove source</button>` : "") +
      `</div>` +
      (existing && existing.sync_error
        // esc: sync_error carries remote-controlled text (git stderr etc.)
        ? `<p class="sync-error">Last error: ${esc(existing.sync_error)}</p>` : "");

    const typeSel = body.querySelector("#sync-type");
    const form = body.querySelector("#sync-form");
    function renderForm() {
      const t = typeSel.value;
      if (!t) { form.innerHTML = ""; return; }
      const schema = types[t];
      form.innerHTML =
        schema.fields.map((f) =>
          fieldRow(f, existing && cur === t ? existing[f] : "", false)).join("") +
        schema.secrets.map((f) =>
          fieldRow(f, existing && cur === t ? existing[f] : "", true)).join("");
      const lookups = LOOKUPS[t] || {};
      for (const [fname, spec] of Object.entries(lookups)) {
        const input = form.querySelector(`input[name="${fname}"]`);
        // Lookups need a SAVED source (they read stored credentials).
        if (input && existing && cur === t) {
          attachLookup(input, spec, path, !!spec.multi);
        }
      }
      if (t === "filesystem") {
        const input = form.querySelector('input[name="fs_path"]');
        if (input) attachDirBrowser(input);
      }
    }
    const OAUTH_TYPES = ["sharepoint", "azure_devops", "google_drive", "box"];
    const connectBtn = body.querySelector("#sync-connect");
    function refreshConnect() {
      connectBtn.classList.toggle(
        "hidden", !(existing && OAUTH_TYPES.includes(typeSel.value)));
    }
    connectBtn.onclick = async () => {
      try {
        const r = await api("GET",
          `/api/sync/oauth/auth?folder_path=${encodeURIComponent(path)}`);
        window.open(r.auth_url, "voitta-oauth", "width=600,height=700");
        toast("Complete the sign-in in the popup");
      } catch (e) { toast(e.message); }
    };
    typeSel.onchange = () => { renderForm(); refreshConnect(); };
    renderForm();
    refreshConnect();

    body.querySelector("#sync-save").onclick = async () => {
      const t = typeSel.value;
      if (!t) { toast("Pick a source type"); return; }
      const payload = { source_type: t };
      for (const input of form.querySelectorAll("input")) {
        if (input.value !== "") payload[input.name] = input.value;
      }
      try {
        await api("PUT", `/api/sync/${path}`, payload);
        toast("Sync source saved");
        closeModal();
        refreshList();
      } catch (e) { toast(e.message); }
    };
    const triggerBtn = body.querySelector("#sync-trigger");
    if (triggerBtn) triggerBtn.onclick = async () => {
      try {
        await api("POST", `/api/sync/${path}/trigger`);
        toast("Sync started");
        closeModal();
      } catch (e) { toast(e.message); }
    };
    const removeBtn = body.querySelector("#sync-remove");
    if (removeBtn) removeBtn.onclick = async () => {
      if (!confirm("Remove this sync source? Files stay on disk.")) return;
      try {
        await api("DELETE", `/api/sync/${path}`);
        toast("Sync source removed");
        closeModal();
        refreshList();
      } catch (e) { toast(e.message); }
    };
  }

  // ---- project selector + management ----
  const projectSelect = document.getElementById("project-select");
  if (projectSelect) projectSelect.onchange = async () => {
    await api("POST", `/api/projects/${projectSelect.value}/select`);
    refreshList();
  };
  const newProjectBtn = document.getElementById("new-project-btn");
  if (newProjectBtn) newProjectBtn.onclick = async () => {
    const name = prompt("New project name:");
    if (!name) return;
    try {
      const p = await api("POST", "/api/projects", { name });
      await api("POST", `/api/projects/${p.id}/select`);
      refreshList();
    } catch (e) { toast(e.message); }
  };
  const delProjectBtn = document.getElementById("delete-project-btn");
  if (delProjectBtn) delProjectBtn.onclick = async () => {
    const opt = projectSelect.selectedOptions[0];
    if (!confirm(`Delete project "${opt.textContent.trim()}"?`)) return;
    try {
      await api("DELETE", `/api/projects/${projectSelect.value}`);
      refreshList();
    } catch (e) { toast(e.message); }
  };

  // ---- folder / file actions ----
  const newFolderBtn = document.getElementById("new-folder-btn");
  if (newFolderBtn) newFolderBtn.onclick = async () => {
    const name = prompt("New folder name:");
    if (!name) return;
    try {
      await api("POST", "/api/folders", { path: currentPath, name });
      refreshList();
    } catch (e) { toast(e.message); }
  };

  async function uploadFiles(files) {
    if (!files || !files.length) return;
    const form = new FormData();
    form.append("path", currentPath);
    for (const f of files) form.append("files", f);
    showSpinner();
    try {
      const resp = await fetch("/api/files/upload",
        { method: "POST", body: form });
      if (resp.ok) {
        toast(`Uploaded ${files.length} file${files.length > 1 ? "s" : ""}`);
        refreshList();
      } else {
        const detail = await resp.json().catch(() => ({}));
        toast(detail.detail || "Upload failed");
      }
    } finally { hideSpinner(); }
  }
  const uploadInput = document.getElementById("upload-input");
  if (uploadInput) uploadInput.onchange =
    () => uploadFiles(uploadInput.files);

  // Drag-and-drop upload. Handlers live at the WINDOW level: the drop hint
  // overlays the whole viewport, so a drop released outside the .browser
  // element must still be intercepted — otherwise the browser navigates to
  // the dropped file and the page state is lost.
  const dropHint = document.getElementById("drop-hint");
  if (dropHint) {
    let dragDepth = 0;
    window.addEventListener("dragenter", (e) => {
      if (![...e.dataTransfer.types].includes("Files")) return;
      e.preventDefault();
      dragDepth++;
      dropHint.classList.remove("hidden");
    });
    // Guard every handler on Files: hijacking text/link drags would break
    // native drag-to-input behavior across the page.
    window.addEventListener("dragover", (e) => {
      if ([...e.dataTransfer.types].includes("Files")) e.preventDefault();
    });
    window.addEventListener("dragleave", () => {
      if (--dragDepth <= 0) { dragDepth = 0; dropHint.classList.add("hidden"); }
    });
    window.addEventListener("drop", (e) => {
      dragDepth = 0;
      dropHint.classList.add("hidden");
      if (![...e.dataTransfer.types].includes("Files")) return;
      e.preventDefault();
      uploadFiles(e.dataTransfer.files);
    });
  }

  // Escape closes the topmost surface: modal, then details panel.
  document.addEventListener("keydown", (e) => {
    if (e.key !== "Escape") return;
    if (document.getElementById("modal-overlay")) closeModal();
    else {
      const panel = document.getElementById("details-panel");
      if (panel) panel.classList.add("hidden");
    }
  });

  // ---- details sidebar (reference app.js:513-915: state, file-type stats,
  // sync info, metadata notes) ----
  function esc(s) {
    return String(s).replace(/&/g, "&amp;").replace(/</g, "&lt;")
      .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
  }
  function fmtSize(n) {
    if (n == null) return "";
    if (n >= 1 << 30) return (n / (1 << 30)).toFixed(1) + " GB";
    if (n >= 1 << 20) return (n / (1 << 20)).toFixed(1) + " MB";
    if (n >= 1024) return (n / 1024).toFixed(1) + " KB";
    return n + " B";
  }
  async function openDetails(path) {
    const panel = document.getElementById("details-panel");
    const d = await api("GET", `/api/details/${path}`);
    let html = `<div class="details-head"><h3>${esc(path || "/")}</h3>` +
      `<button id="details-close" title="Close">✕</button></div>`;
    if (d.is_dir) {
      html += `<dl class="details-grid">` +
        `<dt>Index status</dt><dd><span class="status status-${esc(d.index_status)}">${esc(d.index_status)}</span></dd>` +
        (d.index_error ? `<dt>Index error</dt><dd class="error">${esc(d.index_error)}</dd>` : "") +
        `<dt>Indexed files</dt><dd>${d.indexed_files}</dd>` +
        `<dt>Total chunks</dt><dd>${d.total_chunks}</dd>` +
        (d.counts ? `<dt>Contents</dt><dd>${d.counts.files} files · ${d.counts.dirs} folders</dd>` : "") +
        (typeof d.search_active === "boolean"
          ? `<dt>Search</dt><dd>${d.search_active ? "active" : "off"}</dd>` : "") +
        (typeof d.indexing_enabled === "boolean"
          ? `<dt>Indexing</dt><dd>${d.indexing_enabled ? "enabled" : "off"}</dd>` : "") +
        `</dl>`;
      if (d.sync) {
        html += `<h4>Sync</h4><dl class="details-grid">` +
          `<dt>Source</dt><dd>${esc(d.sync.source_type)}</dd>` +
          `<dt>Status</dt><dd><span class="status status-${esc(d.sync.sync_status || "none")}">${esc(d.sync.sync_status || "never")}</span></dd>` +
          (d.sync.last_synced_at ? `<dt>Last sync</dt><dd>${esc(d.sync.last_synced_at)}</dd>` : "") +
          (d.sync.sync_error ? `<dt>Error</dt><dd class="error">${esc(d.sync.sync_error)}</dd>` : "") +
          `</dl>`;
      }
      if (d.file_types && d.file_types.length) {
        html += `<h4>File types</h4><table class="type-stats">` +
          `<tr><th>ext</th><th>files</th><th>indexed</th><th>chunks</th></tr>` +
          d.file_types.slice(0, 12).map((s) =>
            `<tr><td>${esc(s.extension)}</td><td>${s.total_count}</td>` +
            `<td>${s.indexed_count}</td><td>${s.chunk_count}</td></tr>`
          ).join("") + `</table>`;
      }
      html += `<div class="details-actions">` +
        `<button id="reindex-btn">Force reindex</button>` +
        `<button id="sync-btn">Sync now</button>` +
        `<button id="sync-config-btn">Sync source…</button></div>`;
    } else {
      html += `<dl class="details-grid">` +
        `<dt>Size</dt><dd>${fmtSize(d.size)}</dd>` +
        `<dt>Modified</dt><dd>${d.modified_at
          ? new Date(d.modified_at * 1000).toLocaleString() : ""}</dd>` +
        `<dt>Indexed</dt><dd>${d.indexed ? "yes" : "no"}</dd>` +
        `<dt>Chunks</dt><dd>${d.chunk_count}</dd>` +
        (d.content_hash ? `<dt>Hash</dt><dd class="mono">${esc(d.content_hash.slice(0, 16))}…</dd>` : "") +
        `</dl>`;
      if (d.parse_error) {
        html += `<p class="parse-error" title="${esc(d.parse_error)}">` +
          `⚠ ${esc(d.parse_error)}</p>`;
      }
    }
    html += `<h4>Notes</h4>` +
      `<textarea id="meta-text" rows="4">${esc((d.metadata && d.metadata.metadata) || "")}</textarea>` +
      (d.metadata && d.metadata.updated_by
        ? `<p class="meta-attrib">last edited by ${esc(d.metadata.updated_by)}</p>` : "") +
      `<button id="meta-save">Save notes</button>`;
    panel.innerHTML = html;
    panel.classList.remove("hidden");
    panel.querySelector("#details-close").onclick =
      () => panel.classList.add("hidden");
    panel.querySelector("#meta-save").onclick = async () => {
      try {
        await api("PUT", `/api/metadata/${path}`,
          { metadata: panel.querySelector("#meta-text").value });
        toast("Notes saved");
      } catch (e) { toast(e.message); }
    };
    const reindexBtn = panel.querySelector("#reindex-btn");
    if (reindexBtn) reindexBtn.onclick = async () => {
      try {
        await api("POST", `/api/settings/folders/${path}/reindex`, {});
        toast("Reindex queued");
      } catch (e) { toast(e.message); }
    };
    const syncBtn = panel.querySelector("#sync-btn");
    if (syncBtn) syncBtn.onclick = async () => {
      try {
        await api("POST", `/api/sync/${path}/trigger`);
        toast("Sync started");
      } catch (e) { toast(e.message); }
    };
    const syncConfigBtn = panel.querySelector("#sync-config-btn");
    if (syncConfigBtn) syncConfigBtn.onclick =
      () => openSyncModal(path).catch((e) => toast(e.message));
  }

  // ---- file-list actions, DELEGATED to the tbody so AJAX-refreshed rows
  // stay live without rebinding ----
  if (listBody) {
    listBody.addEventListener("change", async (ev) => {
      const row = ev.target.closest("tr");
      if (!row) return;
      const path = row.dataset.path;
      if (ev.target.classList.contains("toggle-search")) {
        const box = ev.target;
        try {
          const r = await api("POST",
            `/api/settings/folders/${path}/search-active`,
            { search_active: box.checked });
          toast(`Search ${box.checked ? "on" : "off"} ` +
                `(+${r.subfolders_updated} subfolders)`);
        } catch (e) { toast(e.message); box.checked = !box.checked; }
      } else if (ev.target.classList.contains("toggle-index")) {
        const box = ev.target;
        try {
          await api("POST", `/api/settings/folders/${path}/indexing`,
            { enabled: box.checked });
          toast(box.checked ? "Indexing queued" : "Indexing disabled");
        } catch (e) { toast(e.message); }
      }
    });
    listBody.addEventListener("click", async (ev) => {
      const row = ev.target.closest("tr");
      if (!row) return;
      const path = row.dataset.path;
      const isDir = /^t/i.test(row.dataset.dir || "");
      if (ev.target.closest(".details-btn")) {
        openDetails(path).catch((e) => toast(e.message));
      } else if (ev.target.closest(".delete-btn")) {
        if (!confirm(`Delete ${path}?`)) return;
        try {
          if (isDir) await api("DELETE", `/api/folders/${path}`);
          else await api("DELETE", `/api/files/${path}`);
          refreshList();
        } catch (e) { toast(e.message); }
      }
    });
  }
  updateFooter();
})();
