"""``cdx_toolkit_ray.warc`` — import-path parity with the reference's
``cdx_toolkit.warc`` module (cdx_toolkit/warc.py:159-213), so reference
example code (examples/iter-and-warc.py:17) ports by changing only the
package name::

    writer = cdx_toolkit_ray.warc.get_writer('EX', 'CC', info,
                                             warc_version='1.1')
    for obj in cdx.iter(url, limit=10):
        writer.write_record(obj.fetch_warc_record())
"""

from .pipelines.warcout import (  # noqa: F401
    SegmentedParquetWriter,
    get_writer,
    synthesize_wb_record,
    wb_redir_to_original,
)
