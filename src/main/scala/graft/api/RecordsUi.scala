package graft.api

/** The engine-served counterpart of the reference's thin browser client
  * (`app/UI/index.html` + `app/UI/assets/javascript/app.js:12-42`): a form
  * for server url / stream name / minutes-ago that issues
  * `GET /records?streamname=...&duration=...` and pretty-prints the JSON
  * response (or the error status) into a `<pre>` block.
  *
  * Deliberately NOT a copy: the reference page pulls jQuery/Bootstrap/
  * prettify off public CDNs; this one is a single self-contained document
  * (vanilla `fetch`, no external assets — it must work from an air-gapped
  * cluster edge node), served by [[RecordsHttpServer]] itself at `GET /`
  * instead of from a separate static host. Same capabilities, same wire
  * calls, zero dependencies. */
object RecordsUi {

  val Html: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8">
      |<meta name="viewport" content="width=device-width, initial-scale=1.0">
      |<title>graft records</title>
      |<style>
      |  body { font-family: ui-monospace, Menlo, Consolas, monospace;
      |         margin: 2rem; background: #1e1e1e; color: #d4d4d4; }
      |  .row { margin: .5rem 0; }
      |  label { display: inline-block; min-width: 12rem; }
      |  input { background: #2a2a2a; color: #d4d4d4; border: 1px solid #555;
      |          padding: .25rem .5rem; min-width: 16rem; }
      |  button { padding: .35rem 1rem; cursor: pointer; }
      |  pre { background: #111; border: 1px solid #333; padding: 1rem;
      |        overflow: auto; max-height: 70vh; }
      |</style>
      |</head>
      |<body>
      |<h3>graft &mdash; stream records</h3>
      |<div class="row"><label for="url">url of server:</label>
      |  <input id="url" type="url" value=""></div>
      |<div class="row"><label for="streamname">kinesis stream name:</label>
      |  <input id="streamname" type="text" value="example-stream"></div>
      |<div class="row"><label for="minutes">minutes ago:</label>
      |  <input id="minutes" type="number" value="10" min="1" max="300"></div>
      |<div class="row"><button id="getJson">Get JSON</button></div>
      |<pre id="data">{
      |    "status": "fill out the form and click [Get JSON]"
      |}</pre>
      |<script>
      |"use strict";
      |var out = document.getElementById("data");
      |function show(obj) { out.textContent = JSON.stringify(obj, null, 4); }
      |document.getElementById("url").value = window.location.origin;
      |document.getElementById("getJson").addEventListener("click", function () {
      |  show({ status: "loading" });
      |  var u;
      |  try {
      |    u = new URL("records",
      |      document.getElementById("url").value.replace(/\/?$/, "/"));
      |  } catch (e) {
      |    // new URL throws synchronously on a malformed server url (e.g. no
      |    // scheme) - outside the fetch chain, so it needs its own handler
      |    // or the page would sit on "loading" forever
      |    show({ status: "invalid server url" });
      |    return;
      |  }
      |  u.searchParams.append("streamname",
      |    document.getElementById("streamname").value);
      |  u.searchParams.append("duration",
      |    document.getElementById("minutes").value);
      |  fetch(u.toString())
      |    .then(function (res) { return res.json(); })
      |    .then(show)
      |    .catch(function () { show({ status: "could not connect to server" }); });
      |});
      |</script>
      |</body>
      |</html>
      |""".stripMargin
}
