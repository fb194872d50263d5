"""Render the markdown docs to a static HTML site (``docs/html/``).

The reference ships a Sphinx/RST site (``/root/reference/docs/source/``);
this repo's docs are markdown (``docs/*.md`` + README). Sphinx is not in
this environment, so the site is rendered with the ``markdown`` package:
one page per source file, a shared navigation bar, fenced-code and table
support, and a generated index.

    python docs/build_html.py      # writes docs/html/*.html
    make docs                      # same, via the Makefile
"""

import html
import re
import sys
from pathlib import Path

import markdown

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "docs" / "html"

PAGES = [
    ("index", ROOT / "README.md", "Overview"),
    ("user_guide", ROOT / "docs" / "user_guide.md", "User guide"),
    ("bess", ROOT / "docs" / "bess.md", "BESS distribution schemes"),
    ("performance", ROOT / "docs" / "performance.md", "Performance"),
    ("api", ROOT / "docs" / "api.md", "API reference"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — besskge_tpu</title>
<style>
body {{ font: 16px/1.6 -apple-system, "Segoe UI", Roboto, sans-serif;
       margin: 0; color: #1a1a1a; }}
nav {{ background: #16202b; padding: 0.6em 1.2em; position: sticky; top: 0; }}
nav a {{ color: #cfd8e3; text-decoration: none; margin-right: 1.2em;
        font-size: 15px; }}
nav a.current {{ color: #fff; font-weight: 600;
                border-bottom: 2px solid #5b9dd9; }}
main {{ max-width: 54em; margin: 0 auto; padding: 1.5em 1.2em 4em; }}
pre {{ background: #f4f6f8; border: 1px solid #e1e5ea; border-radius: 6px;
      padding: 0.8em 1em; overflow-x: auto; font-size: 13.5px; }}
code {{ font-family: "SF Mono", Menlo, Consolas, monospace;
       font-size: 0.92em; background: #f4f6f8; padding: 0.1em 0.3em;
       border-radius: 3px; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; margin: 1em 0; display: block;
        overflow-x: auto; }}
th, td {{ border: 1px solid #d5dbe2; padding: 0.35em 0.7em;
         font-size: 14.5px; }}
th {{ background: #eef1f5; text-align: left; }}
h1, h2, h3 {{ line-height: 1.25; }}
h2 {{ border-bottom: 1px solid #e1e5ea; padding-bottom: 0.2em;
     margin-top: 1.8em; }}
a {{ color: #2667a8; }}
blockquote {{ border-left: 3px solid #c9d4df; margin-left: 0;
             padding-left: 1em; color: #444; }}
</style>
</head>
<body>
<nav>{nav}</nav>
<main>{body}</main>
</body>
</html>
"""


def build() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "toc", "sane_lists"]
    )
    written = 0
    for slug, src, title in PAGES:
        if not src.exists():
            print(f"skip {src} (missing)", file=sys.stderr)
            continue
        text = src.read_text()
        # Rewrite intra-repo .md links to the rendered pages.
        for other_slug, other_src, _ in PAGES:
            text = re.sub(
                rf"\((?:\./)?(?:docs/)?{re.escape(other_src.name)}(#[^)]*)?\)",
                rf"({other_slug}.html\1)",
                text,
            )
        body = md.reset().convert(text)
        nav = "".join(
            f'<a href="{s}.html"'
            + (' class="current"' if s == slug else "")
            + f">{html.escape(t)}</a>"
            for s, _, t in PAGES
        )
        (OUT / f"{slug}.html").write_text(
            TEMPLATE.format(title=html.escape(title), nav=nav, body=body)
        )
        written += 1
    print(f"wrote {written} pages to {OUT}")
    return 0 if written == len(PAGES) else 1


if __name__ == "__main__":
    sys.exit(build())
