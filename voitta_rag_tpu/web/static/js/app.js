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

  function refreshList() { location.reload(); }

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
    const data = await api("GET",
      `/api/search?q=${encodeURIComponent(q)}&limit=10`);
    searchResults.innerHTML = "";
    if (!data.results.length) {
      searchResults.textContent = "No results.";
    }
    for (const r of data.results) {
      const div = document.createElement("div");
      div.className = "result";
      div.innerHTML =
        `<div class="meta"><span class="score">${r.score.toFixed(3)}</span> ` +
        `— ${r.file_path} · chunk ${r.chunk_index + 1}/${r.total_chunks}` +
        (r.memory_id ? " · memory" : "") + `</div>` +
        `<div>${r.text.slice(0, 400)}</div>`;
      searchResults.appendChild(div);
    }
    searchResults.classList.remove("hidden");
  }
  if (searchBtn) searchBtn.onclick = () => runSearch().catch(e => toast(e.message));
  if (searchInput) searchInput.addEventListener("keydown", (e) => {
    if (e.key === "Enter") runSearch().catch(err => toast(err.message));
  });

  // ---- project selector ----
  const projectSelect = document.getElementById("project-select");
  if (projectSelect) projectSelect.onchange = async () => {
    await api("POST", `/api/projects/${projectSelect.value}/select`);
    refreshList();
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

  const uploadInput = document.getElementById("upload-input");
  if (uploadInput) uploadInput.onchange = async () => {
    const form = new FormData();
    form.append("path", currentPath);
    for (const f of uploadInput.files) form.append("files", f);
    const resp = await fetch("/api/files/upload", { method: "POST", body: form });
    if (resp.ok) { toast("Uploaded"); refreshList(); }
    else toast("Upload failed");
  };

  document.querySelectorAll("#file-list-body tr").forEach((row) => {
    const path = row.dataset.path;
    const isDir = row.dataset.dir === "True" || row.dataset.dir === "true";

    const toggleSearch = row.querySelector(".toggle-search");
    if (toggleSearch) toggleSearch.onchange = async () => {
      try {
        const r = await api("POST",
          `/api/settings/folders/${path}/search-active`,
          { search_active: toggleSearch.checked });
        toast(`Search ${toggleSearch.checked ? "on" : "off"} ` +
              `(+${r.subfolders_updated} subfolders)`);
      } catch (e) { toast(e.message); toggleSearch.checked = !toggleSearch.checked; }
    };

    const toggleIndex = row.querySelector(".toggle-index");
    if (toggleIndex) toggleIndex.onchange = async () => {
      try {
        await api("POST", `/api/settings/folders/${path}/indexing`,
          { enabled: toggleIndex.checked });
        toast(toggleIndex.checked ? "Indexing queued" : "Indexing disabled");
      } catch (e) { toast(e.message); }
    };

    const detailsBtn = row.querySelector(".details-btn");
    if (detailsBtn) detailsBtn.onclick = async () => {
      const panel = document.getElementById("details-panel");
      try {
        const d = await api("GET", `/api/details/${path}`);
        const rows = Object.entries(d)
          .filter(([k, v]) => v !== null && typeof v !== "object")
          .map(([k, v]) => `<dt>${k}</dt><dd>${v}</dd>`).join("");
        panel.innerHTML =
          `<h3>${path}</h3><dl>${rows}</dl>` +
          (d.is_dir ? `<button id="reindex-btn">Force reindex</button>` : "") +
          (d.is_dir ? ` <button id="sync-btn">Sync now</button>` : "") +
          `<h4>Notes</h4><textarea id="meta-text" rows="4" style="width:100%">` +
          `${(d.metadata && d.metadata.metadata) || ""}</textarea>` +
          `<button id="meta-save">Save notes</button> ` +
          `<button id="details-close">Close</button>`;
        panel.classList.remove("hidden");
        panel.querySelector("#details-close").onclick =
          () => panel.classList.add("hidden");
        panel.querySelector("#meta-save").onclick = async () => {
          await api("PUT", `/api/metadata/${path}`,
            { metadata: panel.querySelector("#meta-text").value });
          toast("Notes saved");
        };
        const reindexBtn = panel.querySelector("#reindex-btn");
        if (reindexBtn) reindexBtn.onclick = async () => {
          await api("POST", `/api/settings/folders/${path}/reindex`);
          toast("Reindex queued");
        };
        const syncBtn = panel.querySelector("#sync-btn");
        if (syncBtn) syncBtn.onclick = async () => {
          try {
            await api("POST", `/api/sync/${path}/trigger`);
            toast("Sync started");
          } catch (e) { toast(e.message); }
        };
      } catch (e) { toast(e.message); }
    };

    const deleteBtn = row.querySelector(".delete-btn");
    if (deleteBtn) deleteBtn.onclick = async () => {
      if (!confirm(`Delete ${path}?`)) return;
      try {
        if (isDir) await api("DELETE", `/api/folders/${path}`);
        else toast("File deletion: remove via folder management");
        refreshList();
      } catch (e) { toast(e.message); }
    };
  });
})();
