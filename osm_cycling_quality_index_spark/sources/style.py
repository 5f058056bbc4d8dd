"""QML style sink (SURVEY.md §2.1 S7).

The reference ships a QGIS graduated style over the ``index`` column
(reference/cycling_quality_index.py:1650-1655, reference/styles/index.qml):
11 classes 0-10, 10-20, ..., 90-100 plus the exact-100 class, each a fixed
line color.  This module GENERATES a minimal equivalent QML — same
attribute, class bounds, labels, colors and line width (the data values,
cited above) in a from-scratch document structure — so a user can load the
engine's GeoJSON/parquet output in QGIS with the reference's exact look.
"""

from __future__ import annotations

from xml.sax.saxutils import quoteattr

#: (lower, upper, label, "r,g,b,a") per class — values from
#: reference/styles/index.qml (symbols 0..10, line width 1.5)
INDEX_CLASSES = [
    (0.0, 10.0, "0 - 10", "122,4,3,255"),
    (10.0, 20.0, "10 - 20", "171,27,4,255"),
    (20.0, 30.0, "20 - 30", "213,74,18,255"),
    (30.0, 40.0, "30 - 40", "245,160,56,255"),
    (40.0, 50.0, "40 - 50", "243,207,51,255"),
    (50.0, 60.0, "50 - 60", "230,241,34,255"),
    (60.0, 70.0, "60 - 70", "167,200,120,255"),
    (70.0, 80.0, "70 - 80", "103,159,206,255"),
    (80.0, 90.0, "80 - 90", "68,115,225,255"),
    (90.0, 100.0, "90 - 100", "67,109,218,255"),
    (100.0, 100.0, "100 - 100", "65,67,167,255"),
]

LINE_WIDTH = "1.5"


def render_qml(attr: str = "index") -> str:
    """The QML document as a string (driver-side templating; no Spark)."""
    ranges = []
    symbols = []
    for i, (lo, hi, label, color) in enumerate(INDEX_CLASSES):
        ranges.append(
            f'      <range symbol="{i}" lower="{lo}" upper="{hi}" '
            f"label={quoteattr(label)} render=\"true\"/>"
        )
        symbols.append(
            f'      <symbol name="{i}" type="line" alpha="1" clip_to_extent="1">\n'
            f'        <layer class="SimpleLine" enabled="1">\n'
            f'          <Option type="Map">\n'
            f'            <Option type="QString" name="line_color" value={quoteattr(color)}/>\n'
            f'            <Option type="QString" name="line_width" value="{LINE_WIDTH}"/>\n'
            f'            <Option type="QString" name="line_width_unit" value="MM"/>\n'
            f"          </Option>\n"
            f"        </layer>\n"
            f"      </symbol>"
        )
    nl = "\n"
    return (
        '<!DOCTYPE qgis PUBLIC \'http://mrcc.com/qgis.dtd\' \'SYSTEM\'>\n'
        '<qgis styleCategories="Symbology" version="3.34">\n'
        f'  <renderer-v2 type="graduatedSymbol" attr={quoteattr(attr)} '
        'graduatedMethod="GraduatedColor" enableorderby="0" forceraster="0">\n'
        "    <ranges>\n" + nl.join(ranges) + "\n    </ranges>\n"
        "    <symbols>\n" + nl.join(symbols) + "\n    </symbols>\n"
        "  </renderer-v2>\n"
        "</qgis>\n"
    )


def write_qml_style(path: str, attr: str = "index") -> str:
    """S7 sink: write the graduated style next to an export so QGIS picks it
    up automatically (same-stem ``.qml`` convention)."""
    doc = render_qml(attr)
    with open(path, "w") as fh:
        fh.write(doc)
    return path
