from munit_tpu.serve.server import (MicroBatcher, TranslationService,  # noqa: F401
                                    serve)
