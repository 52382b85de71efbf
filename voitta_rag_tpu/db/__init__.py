from voitta_rag_tpu.db.database import Database, get_db, reset_db, init_db  # noqa: F401
from voitta_rag_tpu.db import models  # noqa: F401
