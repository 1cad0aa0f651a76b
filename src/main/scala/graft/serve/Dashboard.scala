package graft.serve

/** The reference's Streamlit viewer (/root/reference/streamlit/app.py:29-112)
  * as one dependency-free HTML page served by [[HttpApi]] at `/dashboard`:
  *
  *  - section 1: dataset 2 (unique salary matches) with a match_score
  *    range slider (app.py:64-73), "showing N of M rows" (app.py:82),
  *    and the filtered average-score metric (app.py:88-92);
  *  - section 2: dataset 3 (SOC posting durations), sorted table
  *    (app.py:95-112).
  *
  * All filtering/aggregation happens server-side in Spark via
  * `/dashboard/data` ([[Serve.dashboardSection]]) — the page only renders
  * JSON, so browser memory never bounds the dataset.
  */
object Dashboard {
  val html: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>NYC Hiring Audit</title>
      |<style>
      |  body { font-family: system-ui, sans-serif; margin: 2rem; }
      |  table { border-collapse: collapse; margin-top: .75rem; font-size: .85rem; }
      |  th, td { border: 1px solid #ccc; padding: .3rem .5rem; text-align: left; }
      |  th { background: #f3f3f3; }
      |  .metric { font-size: 1.2rem; margin: .5rem 0; }
      |  .muted { color: #666; }
      |</style></head>
      |<body>
      |<h1>NYC Hiring Audit</h1>
      |
      |<h2>Job Posting &amp; Payroll: Unique Title &amp; Salary Matches</h2>
      |<div>
      |  match_score range:
      |  <input type="number" id="lo" step="1" style="width:5rem">
      |  &ndash;
      |  <input type="number" id="hi" step="1" style="width:5rem">
      |  <button onclick="loadMatches()">Apply</button>
      |</div>
      |<div class="metric" id="matches-metric"></div>
      |<div class="muted" id="matches-count"></div>
      |<div id="matches-table"></div>
      |
      |<h2>Unique Matched Job Posting Duration (SOC)</h2>
      |<div class="muted" id="soc-count"></div>
      |<div id="soc-table"></div>
      |
      |<script>
      |// gold values originate from an EXTERNAL feed — escape everything
      |// that reaches innerHTML or a title like "<img onerror=…>" executes
      |// in every viewer's browser
      |function esc(v) {
      |  return String(v).replace(/&/g, "&amp;").replace(/</g, "&lt;")
      |    .replace(/>/g, "&gt;").replace(/"/g, "&quot;");
      |}
      |function renderTable(el, rows) {
      |  if (!rows.length) { el.textContent = "No rows returned"; return; }
      |  const cols = Object.keys(rows[0]);
      |  let h = "<table><tr>" + cols.map(c => "<th>" + esc(c) + "</th>").join("") + "</tr>";
      |  for (const r of rows)
      |    h += "<tr>" + cols.map(c => "<td>" + esc(r[c] ?? "") + "</td>").join("") + "</tr>";
      |  el.innerHTML = h + "</table>";
      |}
      |async function section(id, params) {
      |  const q = new URLSearchParams(Object.assign({id: id}, params));
      |  const resp = await fetch("/dashboard/data?" + q);
      |  return resp.json();
      |}
      |async function loadMatches() {
      |  const lo = document.getElementById("lo").value;
      |  const hi = document.getElementById("hi").value;
      |  // a half-specified range is a user error the server would 400 on —
      |  // say so instead of silently fetching unfiltered rows under inputs
      |  // that look like a filter
      |  if ((lo === "") !== (hi === "")) {
      |    document.getElementById("matches-count").textContent =
      |      "Fill in BOTH ends of the match_score range (or clear both).";
      |    return;
      |  }
      |  const p = {score_col: "match_score"};
      |  if (lo !== "" && hi !== "") { p.lo = lo; p.hi = hi; }
      |  const d = await section(2, p);
      |  document.getElementById("matches-count").textContent =
      |    "Showing " + d.rows.length + " of " + d.filtered +
      |    " filtered rows (dataset total " + d.total + ")";
      |  document.getElementById("matches-metric").textContent = d.stats
      |    ? "Average match_score (filtered, unique titles): " + d.stats.mean.toFixed(1)
      |    : "All rows filtered out";
      |  if (d.stats && lo === "" && hi === "") {
      |    document.getElementById("lo").value = d.stats.min;
      |    document.getElementById("hi").value = d.stats.max;
      |  }
      |  renderTable(document.getElementById("matches-table"), d.rows);
      |}
      |async function loadSoc() {
      |  const d = await section(3, {score_col: "median_posting_duration"});
      |  document.getElementById("soc-count").textContent = "Rows: " + d.total;
      |  renderTable(document.getElementById("soc-table"), d.rows);
      |}
      |loadMatches(); loadSoc();
      |</script>
      |</body></html>
      |""".stripMargin
}
