#!/usr/bin/env python3
"""Stamped leak self-check: greps src/ for the same categories the
round artifact (LEAKCHECK.json) reports, and writes LEAKCHECK_SELF.json
carrying the run timestamp and HEAD commit so any re-run is verifiable
against a specific tree state (the round artifact itself carries only
a round counter).

Usage: python3 scripts/leakcheck.py [repo_root]
"""
import datetime
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else ".").resolve()

# category -> regex over source text (case-insensitive where noted)
PATTERNS = {
    # imports from a rooted package (com/org/net/io/...) that is not
    # the JDK, Scala, the Spark/Hadoop ecosystem and its bundled libs,
    # test deps, or this repo's own package. Imports whose first
    # segment is a lowercase value (e.g. `import spark.implicits._`)
    # are Scala value imports, not packages.
    "internal-import": re.compile(
        r"^\s*import\s+(?=(?:com|org|net|io|edu|java|javax|scala)\.)"
        r"(?!java\.|javax\.|scala\.|org\.apache\.|org\.scalatest|"
        r"org\.scalacheck|org\.json4s|org\.slf4j|com\.fasterxml|"
        r"graft\.|com\.sun\.management)\S+",
        re.M),
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|www\.w3\.org|github\.com|"
        r"spark\.apache\.org|issues\.apache\.org|arxiv\.org|doi\.org|"
        r"en\.wikipedia\.org|duckdb\.org|openmrs\.org|docs\.oracle\.com)\S+"),
    "internal-pkg2": re.compile(r"\b(?:com|io|net)\.(?:anthropic|internal)\.\S+"),
    "internal-bucket": re.compile(r"\b(?:s3|gs|s3a|abfss?)://\S+"),
    # go-links must match in their common URL form (…://go/cc) while
    # ordinary path segments (cargo/registry, django/…) stay excluded
    "slack-link": re.compile(
        r"slack\.com|(?:(?<=//)|(?<![A-Za-z0-9_/.-]))go/[a-z][a-z0-9-]+\b"),
    "api-key": re.compile(
        r"(?:api[_-]?key|secret[_-]?key|bearer\s+[A-Za-z0-9_\-]{20,}|"
        r"sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})", re.I),
    "axon-env": re.compile(r"\bAXON_[A-Z0-9_]+"),
}


def head_commit():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, text=True).strip()
    except Exception:
        return None


def main():
    hits = {k: [] for k in PATTERNS}
    for path in sorted((ROOT / "src").rglob("*.scala")):
        text = path.read_text(errors="replace")
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(
                    f"{path.relative_to(ROOT)}:{line}: {m.group(0)[:120]}")
    out = {
        "generated_at": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
        "commit": head_commit(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK_SELF.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"n_hits={out['n_hits']} commit={out['commit']}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
