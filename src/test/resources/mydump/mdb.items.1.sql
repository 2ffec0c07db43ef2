/*!40101 SET NAMES binary*/;
INSERT INTO `items` (`item_id`,`sku`,`qty`,`price`,`tag`) VALUES
(1,'SKU-001',5,19.9900,'new'),
(2,'has''quote',1,NULL,'x\ty'),
(3,'back\\slash',0,-1.5,NULL);
