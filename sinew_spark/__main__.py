"""CLI runner — ``python -m sinew_spark [options] recipe.py``.

The Spark-native counterpart of the reference executable
(/root/reference/bin/sinew:11-25 + lib/sinew/args.rb:14-50 +
lib/sinew/main.rb:8-61): parse options, validate exactly one existing
recipe, derive the default output path ``<recipe_dir>/<basename>.csv``,
run the recipe, print the banner/footer tally report.

A recipe here is a Python module (no eval of untrusted strings) that
defines:

- ``RECIPE``  — a :class:`sinew_spark.recipes.Recipe`
- ``FETCHER`` — optional :class:`sinew_spark.sources.fetch.Fetcher`;
  defaults to :class:`HttpFetcher` (real network). Tests use
  :class:`FixtureFetcher` exactly like the reference's webmock doubles.

Option surface mirrors args.rb: ``-l/--limit``, ``--proxy``,
``--timeout``, ``-s/--silent``, ``-v/--verbose``, ``--dir``,
``--expires`` (``30``/``45m``/``1h``/``2d``/``3w`` durations),
``--force``, ``--force-errors``, ``--version``; engine extras:
``--output``, ``--rate-limit``, ``--master``.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import re
import sys
import tempfile
import time

from sinew_spark import __version__

_DURATION_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_duration(s: str) -> float:
    """httpdisk slop_duration grammar: integer seconds or <n><s|m|h|d|w>."""
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([smhdw]?)", s.strip())
    if not m:
        raise argparse.ArgumentTypeError(f"bad duration {s!r} (ex: 30, 45m, 1h, 2d, 3w)")
    return float(m.group(1)) * _DURATION_UNITS.get(m.group(2) or "s", 1)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sinew-spark", usage="python -m sinew_spark [options] recipe.py"
    )
    p.add_argument("recipe", nargs="?", help="recipe module (defines RECIPE)")
    p.add_argument("-l", "--limit", type=int, help="quit after emitting this many rows")
    p.add_argument("--proxy", help="host[:port] HTTP proxy (comma-delimited list ok)")
    p.add_argument("--timeout", type=float, help="maximum time allowed for the transfer")
    p.add_argument("-s", "--silent", action="store_true", help="suppress some output")
    p.add_argument("-v", "--verbose", action="store_true", help="dump emitted rows while running")
    p.add_argument("--dir", help="set custom cache/work directory")
    p.add_argument(
        "--expires", type=parse_duration, help="when to expire cached requests (ex: 1h, 2d, 3w)"
    )
    p.add_argument("--force", action="store_true", help="don't read anything from cache (but still write)")
    p.add_argument(
        "--force-errors", action="store_true", help="don't read errors from cache (but still write)"
    )
    p.add_argument("--output", help="output CSV path (default: <recipe_dir>/<basename>.csv)")
    p.add_argument("--rate-limit", type=float, help="seconds between requests per host")
    # beyond-reference crawl governance (round 4)
    p.add_argument(
        "--revalidate", action="store_true",
        help="send stored HTTP validators on recrawls (304 = no body transfer)",
    )
    p.add_argument(
        "--url-allow", action="append", default=None, metavar="REGEX",
        help="crawl scope: keep only URLs matching any of these (repeatable)",
    )
    p.add_argument(
        "--url-deny", action="append", default=None, metavar="REGEX",
        help="crawl scope: drop URLs matching any of these (repeatable)",
    )
    p.add_argument(
        "--host-budget", type=int, default=None, metavar="N",
        help="lifetime cap on pages fetched per host",
    )
    p.add_argument(
        "--no-utf8", dest="utf8", action="store_false", default=True,
        help="skip charset transcoding; bodies keep wire bytes 1:1 "
        "(reference `utf8: false`, base.rb:50)",
    )
    p.add_argument("--master", default=None, help="spark master (default local[*])")
    p.add_argument("--version", action="version", version=f"sinew-spark {__version__}")
    return p


def load_recipe_module(path: str):
    spec = importlib.util.spec_from_file_location("_sinew_recipe", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    parser = build_parser()
    if not argv:
        parser.print_usage(sys.stderr)
        return 1
    args = parser.parse_args(argv)
    # exactly one existing recipe (args.rb:42-46)
    if not args.recipe:
        print("error: no RECIPE specified", file=sys.stderr)
        return 1
    if not os.path.exists(args.recipe):
        print(f"error: {args.recipe} not found", file=sys.stderr)
        return 1

    from sinew_spark.crawl import CrawlOptions
    from sinew_spark.recipes import run_recipe
    from sinew_spark.session import get_spark

    mod = load_recipe_module(args.recipe)
    recipe = getattr(mod, "RECIPE", None)
    if recipe is None:
        print(f"error: {args.recipe} defines no RECIPE", file=sys.stderr)
        return 1

    # default output: <recipe_dir>/<basename>.csv (main.rb:8-13)
    output = args.output
    if not output:
        src = args.recipe
        output = os.path.join(
            os.path.dirname(src), os.path.splitext(os.path.basename(src))[0] + ".csv"
        )
        output = re.sub(r"^\./", "", output)

    opt_kwargs = {}
    if args.timeout is not None:
        opt_kwargs["timeout"] = args.timeout
    if args.expires is not None:
        opt_kwargs["expires"] = args.expires
    if args.rate_limit is not None:
        opt_kwargs["rate_limit"] = args.rate_limit
    if args.proxy:
        opt_kwargs["proxies"] = tuple(x.strip() for x in args.proxy.split(",") if x.strip())
    if args.revalidate:
        opt_kwargs["revalidate"] = True
    if args.url_allow:
        opt_kwargs["url_allow"] = tuple(args.url_allow)
    if args.url_deny:
        opt_kwargs["url_deny"] = tuple(args.url_deny)
    if args.host_budget is not None:
        opt_kwargs["host_budget"] = args.host_budget
    if not args.utf8:
        opt_kwargs["utf8"] = False
    options = CrawlOptions(
        force=args.force, force_errors=args.force_errors, **opt_kwargs
    )
    if args.limit is not None:
        recipe.limit = args.limit

    fetcher = getattr(mod, "FETCHER", None)
    if fetcher is None:
        from sinew_spark.sources.fetch import HttpFetcher

        fetcher = HttpFetcher(
            timeout=options.timeout, headers=options.headers,
            insecure=options.insecure, utf8=options.utf8,
        )

    tm = time.time()
    if not args.silent:
        print(f"Writing to {output}...")

    spark = getattr(mod, "SPARK", None)
    own_spark = spark is None
    if own_spark:
        spark = get_spark(master=args.master or "local[*]", app_name="sinew-spark")
    workdir = args.dir or tempfile.mkdtemp(prefix="sinew_cli_")
    try:
        res = run_recipe(spark, recipe, workdir, fetcher, options)
        with open(output, "w", newline="") as f:
            f.write(res.csv)
        if args.verbose:
            sys.stdout.write(res.csv)
        if not args.silent:
            _footer(res, output, time.time() - tm)
    finally:
        if own_spark:
            spark.stop()
    return 0


def _footer(res, output: str, elapsed: float) -> None:
    """Reference footer format (main.rb:41-60): summary banner + tally
    sorted by (-count, column), each line `col count/total pct%`."""
    if res.count == 0:
        print("Done in %ds. Nothing written." % elapsed)
        return
    print("Done in %ds. Wrote %d rows to %s. Summary:" % (elapsed, res.count, output))
    tally = sorted(res.tally.items(), key=lambda kv: (-kv[1], str(kv[0])))
    width = max(len(str(k)) for k, _ in tally)
    for col, n in tally:
        print(
            "  %-*s %7d/%-7d %5.1f%%" % (width + 1, col, n, res.count, n * 100.0 / res.count)
        )


if __name__ == "__main__":
    sys.exit(main())
