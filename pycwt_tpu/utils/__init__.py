from .helpers import (find, rect, boxpdf, get_cache_dir,  # noqa: F401
                      enable_compilation_cache)
