"""LM plan construction tests mirroring prepare_lm_input_target semantics
(llm.py:304-351)."""

import numpy as np

from fangyan_tts_tpu.config import LLMConfig, QwenConfig
from fangyan_tts_tpu.data.lm_plan import IGNORE_ID, build_plan, build_prompt_plan, pad_plans_left, pad_plans_right

CFG = LLMConfig(speech_token_size=100, extra_tokens=8, qwen=QwenConfig(vocab_size=500))


def test_unistream_layout():
    text, speech, instr = [1, 2, 3], [10, 11, 12, 13], [7, 8]
    p = build_plan(CFG, text, speech, instr, bistream=False)
    # [sos, instr(2), text(3), task, speech(4)] = 11
    assert len(p.ids) == 11
    assert p.ids[0] == CFG.sos and p.src[0] == 1
    assert list(p.ids[1:3]) == instr and list(p.src[1:3]) == [0, 0]
    assert list(p.ids[3:6]) == text
    assert p.ids[6] == CFG.task_id and p.src[6] == 1
    assert list(p.ids[7:]) == speech
    # targets: IGNORE*(1+2+3), speech..., eos
    assert list(p.targets[:6]) == [IGNORE_ID] * 6
    assert list(p.targets[6:10]) == speech
    assert p.targets[10] == CFG.eos


def test_bistream_interleave():
    mt, ms = CFG.mix_ratio  # 5, 15
    text = list(range(1, 8))  # 7 text tokens
    speech = list(range(30, 30 + 40))  # 40 speech tokens (ratio 40/7 > 3)
    p = build_plan(CFG, text, speech, bistream=True)
    # chunk 0: full -> 5 text + 15 speech; chunk 1: partial (2 text) ->
    # 2 text + task + 25 speech; total = 1 + 20 + 28 = 49
    assert len(p.ids) == 1 + (5 + 15) + (2 + 1 + 25)
    # after sos: 5 text tokens then 15 speech
    assert list(p.ids[1:6]) == text[:5]
    assert list(p.ids[6:21]) == speech[:15]
    # chunk-0 targets: 4 IGNORE + speech[:15] + fill
    assert list(p.targets[1:5]) == [IGNORE_ID] * 4
    assert list(p.targets[5:20]) == speech[:15]
    assert p.targets[20] == CFG.fill
    # partial chunk: 2 text, task, rest speech; targets 2 IGNORE + rest + eos
    assert list(p.ids[21:23]) == text[5:]
    assert p.ids[23] == CFG.task_id
    assert list(p.ids[24:]) == speech[15:]
    assert list(p.targets[21:23]) == [IGNORE_ID] * 2
    assert list(p.targets[23:48]) == speech[15:]
    assert p.targets[48] == CFG.eos


def test_bistream_falls_back_when_ratio_low():
    p = build_plan(CFG, [1, 2, 3], [10, 11], bistream=True)  # ratio 2/3 < 3
    assert p.ids[-3] == 10 or p.ids[1] == 1  # unistream layout
    assert p.targets[-1] == CFG.eos
    assert CFG.fill not in list(p.targets)


def test_padding_helpers():
    p1 = build_plan(CFG, [1], [10, 11])
    p2 = build_plan(CFG, [1, 2, 3], [10, 11, 12, 13])
    batch = pad_plans_right([p1, p2])
    assert batch["src"].shape == batch["ids"].shape == batch["targets"].shape
    assert list(batch["lengths"]) == [len(p1.ids), len(p2.ids)]
    assert batch["targets"][0, len(p1.ids):].tolist() == [IGNORE_ID] * (batch["ids"].shape[1] - len(p1.ids))

    pp = build_prompt_plan(CFG, [1, 2], [10])
    lp = pad_plans_left([pp], length=8)
    assert lp["ids"].shape == (1, 8)
    assert lp["ids"][0, :3].tolist() == [0, 0, 0]  # left padding
    assert lp["ids"][0, 3] == CFG.sos
    assert lp["ids"][0, -1] == 10
