"""Composite (auto) driver: real hardware hides fakes unless configured.

Reference ``devices/composite.py`` semantics, tested with stub drivers
(no hardware in this image).
"""

from __future__ import annotations

import pytest

from wavecap_tpu.devices.base import DeviceDriver, DeviceInfo
from wavecap_tpu.devices.composite import CompositeDriver
from wavecap_tpu.devices.fake import FakeDriver


class StubDriver(DeviceDriver):
    def __init__(self, name, ids, broken=False):
        self.name = name
        self._ids = ids
        self.broken = broken
        self.opened: list[str] = []

    def enumerate(self):
        if self.broken:
            raise RuntimeError("driver exploded")
        return [DeviceInfo(id=i, driver=self.name, label=i) for i in self._ids]

    def open(self, device_id):
        self.opened.append(device_id)
        return object()


class TestComposite:
    def test_real_devices_hide_fake(self):
        real = StubDriver("rtl", ["rtl0", "rtl1"])
        comp = CompositeDriver(drivers=[real], fake=FakeDriver())
        ids = [d.id for d in comp.enumerate()]
        assert ids == ["rtl0", "rtl1"]

    def test_no_real_devices_falls_back_to_fake(self):
        comp = CompositeDriver(drivers=[StubDriver("rtl", [])], fake=FakeDriver())
        ids = [d.id for d in comp.enumerate()]
        assert ids and all(i.startswith("fake") for i in ids)

    def test_show_fake_device_keeps_fakes_visible(self):
        real = StubDriver("rtl", ["rtl0"])
        comp = CompositeDriver(
            drivers=[real], fake=FakeDriver(), show_fake_device=True
        )
        ids = [d.id for d in comp.enumerate()]
        assert "rtl0" in ids and any(i.startswith("fake") for i in ids)

    def test_broken_driver_does_not_hide_others(self):
        comp = CompositeDriver(
            drivers=[StubDriver("soapy", [], broken=True),
                     StubDriver("rtl", ["rtl0"])],
            fake=FakeDriver(),
        )
        assert [d.id for d in comp.enumerate()] == ["rtl0"]

    def test_open_routes_to_owning_driver(self):
        rtl = StubDriver("rtl", ["rtl0"])
        soapy = StubDriver("soapy", ["soapy0"])
        comp = CompositeDriver(drivers=[rtl, soapy], fake=FakeDriver())
        comp.open("soapy0")
        assert soapy.opened == ["soapy0"] and rtl.opened == []
        with pytest.raises(KeyError):
            comp.open("nope99")

    def test_open_fake_when_hidden_still_works(self):
        """A capture created against a fake id keeps working even after
        real hardware appears (open is id-routed, not visibility-routed)."""
        real = StubDriver("rtl", ["rtl0"])
        fake = FakeDriver()
        comp = CompositeDriver(drivers=[real], fake=fake)
        fid = fake.enumerate()[0].id
        assert comp.open(fid) is not None

    def test_config_auto_selects_composite(self):
        from wavecap_tpu.server.app import create_device_driver
        from wavecap_tpu.utils.config import config_from_dict

        cfg = config_from_dict({"device": {"driver": "auto"}})
        drv = create_device_driver(cfg)
        assert isinstance(drv, CompositeDriver)
        # no hardware in this image: enumerate falls back to fakes
        assert all(d.id.startswith("fake") for d in drv.enumerate())
