from quest_tpu.engine.engine import QuestEngine
from quest_tpu.engine.scheduler import (ContinuousBatchingEngine, Request,
                                        StepEvent)

__all__ = ["QuestEngine", "ContinuousBatchingEngine", "Request",
           "StepEvent"]
